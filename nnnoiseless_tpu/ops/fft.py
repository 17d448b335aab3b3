"""Windowed real DFT analysis / synthesis as MXU matmuls.

The reference runs an unnormalized 960-point real FFT, scales the forward
transform by ``wnorm = 1/sum(w^2)`` and divides the (unnormalized) inverse
by 2 (src/features.rs:281-298, 263-275).

TPU-first design: at N=960 an FFT op is *not* the right primitive for this
hardware — XLA's TPU FFT lowering generates an enormous mixed-radix program
(minutes of compile time per shape) and runs on the VPU.  Instead the
transform is a two-stage Cooley-Tukey factorization 960 = 30 x 32 where
each stage is a dense matmul against a precomputed DFT basis and the
twiddles are one elementwise complex multiply:

    X[30 d + c] = sum_b  W_960^{bc} ( sum_a x[32 a + b] W_30^{ac} ) W_32^{bd}

That is ~185 KFLOP per frame versus ~1.85 MFLOP for the naive dense DFT —
batched over streams both stages are (B*32, 30) @ (30, 30)-class MXU
contractions that compile in milliseconds.

Spectra are packed real tensors of shape ``(..., 2, 481)`` (index 0 = real,
1 = imaginary part) — the experimental TPU platform has incomplete
complex64 support, and downstream consumers (band energies, comb filter,
gain application) only ever need elementwise real arithmetic anyway.

All bases/twiddles are precomputed in float64 and cast to float32; matmuls
run at 3-pass-bf16 precision, which keeps forward+inverse round-trips well
inside the reference's 1e-4 relative-error oracle (src/lib.rs:184-194).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import FREQ_SIZE, WINDOW_SIZE
from ..tables import VORBIS_WINDOW, WNORM
# (matmuls are expressed as einsums with explicit layouts)

# 3-pass-bf16 ("high") matmul precision: ~1e-7 relative error on these
# magnitudes, well inside the 1e-4 oracle, at ~2x the throughput of the
# 6-pass f32 emulation.  Validated against the golden output on TPU.
_PREC = "high"

_N1 = 30  # stage-1 length (over index a)
_N2 = 32  # stage-2 length (over index b)
assert _N1 * _N2 == WINDOW_SIZE


def _bases():
    a = np.arange(_N1)
    b = np.arange(_N2)
    c1 = np.cos(2 * np.pi * np.outer(a, a) / _N1)  # (30, 30), [a, c]
    s1 = np.sin(2 * np.pi * np.outer(a, a) / _N1)
    c2 = np.cos(2 * np.pi * np.outer(b, b) / _N2)  # (32, 32), [b, d]
    s2 = np.sin(2 * np.pi * np.outer(b, b) / _N2)
    # twiddles W_960^{bc}, laid out [c, b]
    tw = 2 * np.pi * np.outer(np.arange(_N1), b) / WINDOW_SIZE
    f32 = lambda m: m.astype(np.float32)
    return (f32(c1), f32(s1), f32(c2), f32(s2), f32(np.cos(tw)), f32(np.sin(tw)))


_C1, _S1, _C2, _S2, _TWC, _TWS = (jnp.asarray(m) for m in _bases())
_TWC_BC = jnp.asarray(np.asarray(_TWC).T.copy())  # twiddles laid out [b, c]
_TWS_BC = jnp.asarray(np.asarray(_TWS).T.copy())
_WINDOW = jnp.asarray(VORBIS_WINDOW)  # (960,)
_WNORM = jnp.float32(WNORM)

# hermitian unfold for the inverse: full[k] = (re[m], +-im[m]) with
# m = k for k <= 480, m = 960 - k otherwise.
_UNFOLD = np.minimum(np.arange(WINDOW_SIZE), WINDOW_SIZE - np.arange(WINDOW_SIZE))
_UNFOLD_IDX = jnp.asarray(_UNFOLD, dtype=np.int32)
_UNFOLD_SIGN = jnp.asarray(
    np.where(np.arange(WINDOW_SIZE) <= WINDOW_SIZE // 2, 1.0, -1.0).astype(np.float32)
)


def forward_transform(frame: jnp.ndarray) -> jnp.ndarray:
    """Window a (..., 960) time frame -> packed (..., 2, 481) spectrum.

    Matches ``numpy.fft.rfft(frame * window) * wnorm``.
    """
    x = (frame * _WINDOW).reshape(frame.shape[:-1] + (_N1, _N2))  # [a, b]
    # stage 1 (real input), output laid out [b, c] so no transposes are
    # needed downstream: Y[b, c] = sum_a x[a, b] W30^{ac}
    yr = jnp.einsum("...ab,ac->...bc", x, _C1, precision=_PREC)
    yi = -jnp.einsum("...ab,ac->...bc", x, _S1, precision=_PREC)
    # twiddle W960^{bc}
    zr = yr * _TWC_BC + yi * _TWS_BC
    zi = yi * _TWC_BC - yr * _TWS_BC
    # stage 2 over b, output [d, c]: flattened row-major that is exactly
    # natural bin order k = 30 d + c — the rfft bins are the first 481.
    xr = jnp.einsum("...bc,bd->...dc", zr, _C2, precision=_PREC) + jnp.einsum(
        "...bc,bd->...dc", zi, _S2, precision=_PREC
    )
    xi = jnp.einsum("...bc,bd->...dc", zi, _C2, precision=_PREC) - jnp.einsum(
        "...bc,bd->...dc", zr, _S2, precision=_PREC
    )
    flat = jnp.stack([xr, xi], axis=-3).reshape(frame.shape[:-1] + (2, _N1 * _N2))
    return flat[..., :FREQ_SIZE] * _WNORM


def inverse_transform(spectrum: jnp.ndarray) -> jnp.ndarray:
    """Packed (..., 2, 481) spectrum -> windowed (..., 960) time frame.

    The unnormalized hermitian inverse DFT divided by 2 (the reference's
    post-scale), then the synthesis window.
    """
    re = jnp.take(spectrum[..., 0, :], _UNFOLD_IDX, axis=-1)
    im = jnp.take(spectrum[..., 1, :], _UNFOLD_IDX, axis=-1) * _UNFOLD_SIGN
    # k = 32 a + b  ->  [a, b]
    shp = spectrum.shape[:-2] + (_N1, _N2)
    xr = re.reshape(shp)
    xi = im.reshape(shp)
    # stage 1 over a, output [b, c]: Y[b, c] = sum_a X[a, b] V30^{ac}
    yr = jnp.einsum("...ab,ac->...bc", xr, _C1, precision=_PREC) - jnp.einsum(
        "...ab,ac->...bc", xi, _S1, precision=_PREC
    )
    yi = jnp.einsum("...ab,ac->...bc", xr, _S1, precision=_PREC) + jnp.einsum(
        "...ab,ac->...bc", xi, _C1, precision=_PREC
    )
    # twiddle V960^{bc}
    zr = yr * _TWC_BC - yi * _TWS_BC
    zi = yi * _TWC_BC + yr * _TWS_BC
    # stage 2 over b, real output only, laid out [d, c] = natural n order
    # (n = 30 d + c): y[d, c] = Re sum_b Z[b, c] V32^{bd}
    y_dc = jnp.einsum("...bc,bd->...dc", zr, _C2, precision=_PREC) - jnp.einsum(
        "...bc,bd->...dc", zi, _S2, precision=_PREC
    )
    y = y_dc.reshape(spectrum.shape[:-2] + (WINDOW_SIZE,))
    return y * (_WINDOW * jnp.float32(0.5))
