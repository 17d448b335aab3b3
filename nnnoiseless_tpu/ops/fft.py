"""Windowed real DFT analysis / synthesis as MXU matmuls.

The reference runs an unnormalized 960-point real FFT, scales the forward
transform by ``wnorm = 1/sum(w^2)`` and divides the (unnormalized) inverse
by 2 (src/features.rs:281-298, 263-275).

TPU-first design: at N=960 an FFT op is *not* the right primitive for this
hardware — XLA's TPU FFT lowering generates an enormous mixed-radix program
(minutes of compile time per shape) and runs on the VPU.  Instead the
transform is a two-stage Cooley-Tukey factorization 960 = 120 x 8:

    n = 8a + b,  k = 120d + c          (a, c in [0,120); b, d in [0,8))
    X[120 d + c] = sum_b W_960^{bc} W_8^{bd} ( sum_a x[8a+b] W_120^{ac} )

The factor split is chosen for the hardware, not for FLOPs: every stage
tensor is laid out (..., 8, 120) so the minor (lane) dimension is 120
(7% padding at 128 lanes, versus 4x waste for a 30/32-minor split), the
stage-1 contraction is a (B*8, 120) @ (120, 120) MXU matmul, stage 2 is a
tiny 8-point DFT, the output falls out in natural bin order, and the only
data movement is ONE static input permutation.

Spectra are packed real tensors of shape ``(..., 2, 481)`` (index 0 = real,
1 = imaginary part) — the experimental TPU platform has incomplete
complex64 support, and downstream consumers (band energies, comb filter,
gain application) only ever need elementwise real arithmetic anyway.

All bases/twiddles are precomputed in float64 and cast to float32; matmuls
run at 3-pass-bf16 precision, which keeps forward+inverse round-trips well
inside the reference's 1e-4 relative-error oracle (src/lib.rs:184-194).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FREQ_SIZE, WINDOW_SIZE
from ..tables import VORBIS_WINDOW, WNORM

# 3-pass-bf16 ("high") matmul precision: ~1e-7 relative error on these
# magnitudes, well inside the 1e-4 oracle, at ~2x the throughput of the
# 6-pass f32 emulation.  Validated against the golden output on TPU.
_PREC = "high"

_NA = 120  # stage-1 length (over index a; lanes carry c in [0,120))
_NB = 8  # stage-2 length (over index b)
assert _NA * _NB == WINDOW_SIZE


def _bases():
    a = np.arange(_NA)
    b = np.arange(_NB)
    c1 = np.cos(2 * np.pi * np.outer(a, a) / _NA)  # (120, 120), [a, c]
    s1 = np.sin(2 * np.pi * np.outer(a, a) / _NA)
    c2 = np.cos(2 * np.pi * np.outer(b, b) / _NB)  # (8, 8), [b, d]
    s2 = np.sin(2 * np.pi * np.outer(b, b) / _NB)
    tw = 2 * np.pi * np.outer(b, a) / WINDOW_SIZE  # W_960^{bc}, laid out [b, c]
    f32 = lambda m: m.astype(np.float32)
    return (f32(c1), f32(s1), f32(c2), f32(s2), f32(np.cos(tw)), f32(np.sin(tw)))


_C1, _S1, _C2, _S2, _TWC, _TWS = (jnp.asarray(m) for m in _bases())
_WINDOW = jnp.asarray(VORBIS_WINDOW)  # (960,)
_WNORM = jnp.float32(WNORM)

# input permutation: element [b, a] of the (8, 120) grid is sample 8a + b.
_PERM_NP = (8 * np.arange(_NA)[None, :] + np.arange(_NB)[:, None]).reshape(-1)
_PERM = jnp.asarray(_PERM_NP, dtype=np.int32)

# hermitian unfold for the inverse: full[k] = (re[m], +-im[m]) with
# m = k for k <= 480, m = 960 - k otherwise — composed with the same [b, a]
# permutation so the inverse also needs only one static gather.
_K = np.minimum(np.arange(WINDOW_SIZE), WINDOW_SIZE - np.arange(WINDOW_SIZE))
_SIGN = np.where(np.arange(WINDOW_SIZE) <= WINDOW_SIZE // 2, 1.0, -1.0)
_UNFOLD_IDX = jnp.asarray(_K[_PERM_NP], dtype=np.int32)
_UNFOLD_SIGN = jnp.asarray(_SIGN[_PERM_NP].astype(np.float32))


def forward_transform(frame: jnp.ndarray) -> jnp.ndarray:
    """Window a (..., 960) time frame -> packed (..., 2, 481) spectrum.

    Matches ``numpy.fft.rfft(frame * window) * wnorm``.
    """
    return rdft_raw(frame * _WINDOW) * _WNORM


def rdft_raw(w: jnp.ndarray) -> jnp.ndarray:
    """Unwindowed, unnormalized real DFT: (..., 960) -> packed (..., 2, 481).

    The two-stage Cooley-Tukey matmul factorization (see module docstring);
    equals ``numpy.fft.rfft(w)`` bin for bin.
    """
    x = jnp.take(w, _PERM, axis=-1).reshape(w.shape[:-1] + (_NB, _NA))
    # stage 1 (real input) over a: Y[b, c] = sum_a x[b, a] W120^{ac}
    yr = jnp.einsum("...ba,ac->...bc", x, _C1, precision=_PREC)
    yi = -jnp.einsum("...ba,ac->...bc", x, _S1, precision=_PREC)
    # twiddle W960^{bc}
    zr = yr * _TWC + yi * _TWS
    zi = yi * _TWC - yr * _TWS
    # stage 2 over b, output [d, c]: flattened row-major that is exactly
    # natural bin order k = 120 d + c — the rfft bins are the first 481.
    xr = jnp.einsum("...bc,bd->...dc", zr, _C2, precision=_PREC) + jnp.einsum(
        "...bc,bd->...dc", zi, _S2, precision=_PREC
    )
    xi = jnp.einsum("...bc,bd->...dc", zi, _C2, precision=_PREC) - jnp.einsum(
        "...bc,bd->...dc", zr, _S2, precision=_PREC
    )
    flat = jnp.stack([xr, xi], axis=-3).reshape(w.shape[:-1] + (2, _NA * _NB))
    return flat[..., :FREQ_SIZE]


def inverse_transform(spectrum: jnp.ndarray) -> jnp.ndarray:
    """Packed (..., 2, 481) spectrum -> windowed (..., 960) time frame.

    The unnormalized hermitian inverse DFT divided by 2 (the reference's
    post-scale), then the synthesis window.
    """
    return irdft_raw(spectrum) * (_WINDOW * jnp.float32(0.5))


def irdft_raw(spectrum: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized hermitian inverse DFT: packed (..., 2, 481) -> (..., 960).

    Equals ``numpy.fft.irfft(spec) * 960`` (no 1/N scale, no window).
    """
    shp = spectrum.shape[:-2] + (_NB, _NA)
    # hermitian unfold + [b, a] permutation in one static gather (k = 8a + b)
    xr = jnp.take(spectrum[..., 0, :], _UNFOLD_IDX, axis=-1).reshape(shp)
    xi = (jnp.take(spectrum[..., 1, :], _UNFOLD_IDX, axis=-1) * _UNFOLD_SIGN).reshape(
        shp
    )
    # stage 1 over a: Y[b, c] = sum_a X[b, a] V120^{ac}   (V = e^{+i...})
    yr = jnp.einsum("...ba,ac->...bc", xr, _C1, precision=_PREC) - jnp.einsum(
        "...ba,ac->...bc", xi, _S1, precision=_PREC
    )
    yi = jnp.einsum("...ba,ac->...bc", xr, _S1, precision=_PREC) + jnp.einsum(
        "...ba,ac->...bc", xi, _C1, precision=_PREC
    )
    # twiddle V960^{bc}
    zr = yr * _TWC - yi * _TWS
    zi = yi * _TWC + yr * _TWS
    # stage 2 over b, real output only, laid out [d, c] = natural n order
    # (n = 120 d + c): y[d, c] = Re sum_b Z[b, c] V8^{bd}
    y_dc = jnp.einsum("...bc,bd->...dc", zr, _C2, precision=_PREC) - jnp.einsum(
        "...bc,bd->...dc", zi, _S2, precision=_PREC
    )
    return y_dc.reshape(spectrum.shape[:-2] + (WINDOW_SIZE,))


@functools.lru_cache(maxsize=1)
def dense_dft_bases():
    """Single-matmul DFT bases with the window/normalization chain folded in.

    Returns numpy f32 arrays (computed in f64):
      F   (960, 962): spec = w960 @ F  ==  window -> rfft -> *wnorm,
                      packed columns [re(481) | im(481)];
      IV1 (962, 480), IV2 (962, 480): y = x @ [IV1 | IV2]  ==  unnormalized
                      hermitian inverse DFT / 2 * window, split at sample
                      480 so overlap-add needs no lane slicing.

    Used by the fused frame kernel (ops/frame_kernel.py) and the chunk
    precompute's lag-0 analysis: on the MXU one dense f32 product beats the
    multi-stage CT einsum chain for throughput, and is bit-tighter than
    3-pass bf16.
    """
    n = np.arange(WINDOW_SIZE)[:, None]
    k = np.arange(FREQ_SIZE)[None, :]
    theta = 2.0 * np.pi * n * k / WINDOW_SIZE
    win = np.asarray(VORBIS_WINDOW, np.float64)[:, None]
    fwd = np.concatenate(
        [win * WNORM * np.cos(theta), -win * WNORM * np.sin(theta)], axis=1
    )  # (960, 962)

    # inverse: y[n] = 0.5*win[n] * (re0 + re480*(-1)^n
    #                 + sum_{k=1..479} 2*(re_k cos - im_k sin))
    ck = np.full(FREQ_SIZE, 2.0)
    ck[0] = ck[-1] = 1.0
    sk = np.full(FREQ_SIZE, -2.0)
    sk[0] = sk[-1] = 0.0
    theta_kn = (
        2.0
        * np.pi
        * np.arange(FREQ_SIZE)[:, None]
        * np.arange(WINDOW_SIZE)[None, :]
        / WINDOW_SIZE
    )
    winr = 0.5 * np.asarray(VORBIS_WINDOW, np.float64)[None, :]
    inv = np.concatenate(
        [winr * ck[:, None] * np.cos(theta_kn), winr * sk[:, None] * np.sin(theta_kn)],
        axis=0,
    )  # (962, 960)
    f32 = lambda m: np.ascontiguousarray(m, np.float32)
    return (
        f32(fwd),
        f32(inv[:, : WINDOW_SIZE // 2]),
        f32(inv[:, WINDOW_SIZE // 2 :]),
    )


@functools.lru_cache(maxsize=8)
def _raw_corr_bases(n_lags: int, n: int = WINDOW_SIZE):
    """Dense raw DFT bases for batched correlation (f64 -> f32).

    FR (n, 2*(n/2+1)): packed unwindowed rfft as one matmul.
    IC (2*(n/2+1), n_lags): hermitian inverse restricted to the first
    n_lags samples with the 1/n scale folded in — replaces the CT inverse
    whose hermitian-unfold is an n-wide lane gather (slow on TPU).
    """
    h = n // 2 + 1
    idx = np.arange(n)[:, None]
    k = np.arange(h)[None, :]
    theta = 2.0 * np.pi * idx * k / n
    fr = np.concatenate([np.cos(theta), -np.sin(theta)], axis=1)  # (n, 2h)

    ck = np.full(h, 2.0)
    ck[0] = ck[-1] = 1.0
    sk = np.full(h, -2.0)
    sk[0] = sk[-1] = 0.0
    lag = np.arange(n_lags)[None, :]
    theta_kl = 2.0 * np.pi * np.arange(h)[:, None] * lag / n
    ic = (
        np.concatenate(
            [ck[:, None] * np.cos(theta_kl), sk[:, None] * np.sin(theta_kl)],
            axis=0,
        )
        / n
    )  # (2h, n_lags)
    f32 = lambda m: np.ascontiguousarray(m, np.float32)
    return f32(fr), f32(ic)


def xcorr_dft(
    kernel: jnp.ndarray, y: jnp.ndarray, n_lags: int, n: int | None = None
) -> jnp.ndarray:
    """corr[s] = dot(kernel, y[s : s+len(kernel)]) via n-point DFTs.

    Batched sliding correlation on the MXU: XLA lowers wide 1-D grouped
    convolutions as shifted multiply-adds (~kernel_taps passes over the
    data — measured ~10x the cost of the whole pitch search at production
    batch), while three dense matmul DFTs are plain MXU products.
    Requires len(kernel) + n_lags - 1 <= n and len(y) <= n (no circular
    wrap); n defaults to the smallest even size that fits.  Broadcasts
    over leading axes.
    """
    if n is None:
        n = max(y.shape[-1], kernel.shape[-1] + n_lags - 1)
        n += n % 2
    assert kernel.shape[-1] + n_lags - 1 <= n and y.shape[-1] <= n
    fr_np, ic_np = _raw_corr_bases(n_lags, n)
    fr = jnp.asarray(fr_np)
    ic = jnp.asarray(ic_np)
    # 3-pass bf16 (~2^-21 rel): validated against the golden oracle and
    # the lag-exact pitch trace on TPU; halves the MXU passes vs HIGHEST.
    prec = jax.lax.Precision.HIGH
    xk = jnp.matmul(
        kernel, fr[: kernel.shape[-1]], precision=prec
    )  # (..., 2h), zero-pad implicit via basis truncation
    yk = jnp.matmul(y, fr[: y.shape[-1]], precision=prec)
    h = n // 2 + 1
    xr, xi = xk[..., :h], xk[..., h:]
    yr, yi = yk[..., :h], yk[..., h:]
    # conj(X) * Y, packed
    prod = jnp.concatenate([xr * yr + xi * yi, xr * yi - xi * yr], axis=-1)
    return jnp.matmul(prod, ic, precision=prec)
