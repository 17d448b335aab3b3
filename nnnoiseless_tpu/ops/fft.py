"""Windowed real DFT analysis / synthesis as dense MXU matmuls.

The reference runs an unnormalized 960-point real FFT, scales the forward
transform by ``wnorm = 1/sum(w^2)`` and divides the (unnormalized) inverse
by 2 (src/features.rs:281-298, 263-275).

TPU-first design: at N=960 an FFT is *not* the right primitive for this
hardware — XLA's TPU FFT lowering generates an enormous mixed-radix program
(~170 s of compile time per shape) and runs on the VPU, while a dense DFT is
a single (B, 960) @ (960, 962) matmul that compiles in milliseconds and
rides the MXU.  At the pipeline's scale (3 transforms per 10 ms frame) the
extra FLOPs are negligible against MXU throughput, and the batched matmul
formulation is strictly faster end to end.

Spectra are packed real tensors of shape ``(..., 2, 481)`` (index 0 = real,
1 = imaginary part) — the experimental TPU platform has incomplete
complex64 support, and downstream consumers (band energies, comb filter,
gain application) only ever need elementwise real arithmetic anyway.

DFT matrices are precomputed in float64 and cast to float32; matmuls run at
``Precision.HIGHEST`` so forward+inverse round-trips stay well inside the
reference's 1e-4 relative-error oracle (src/lib.rs:184-194).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import FREQ_SIZE, WINDOW_SIZE
from ..tables import VORBIS_WINDOW, WNORM
from .precision import matmul


def _build_dft_matrices() -> tuple[np.ndarray, np.ndarray]:
    """(960, 962) forward and (962, 960) inverse real-DFT matrices.

    Forward matches ``numpy.fft.rfft``: out[..., 0, k] = sum_n x[n] cos(wkn),
    out[..., 1, k] = -sum_n x[n] sin(wkn).  Inverse is the unnormalized
    hermitian inverse divided by 2 (the reference's post-scale,
    features.rs:265-268): x[n] = sum_k w_k (re_k cos(wkn) - im_k sin(wkn))/2
    with w_k = 1 for the DC/Nyquist bins and 2 elsewhere.
    """
    n = np.arange(WINDOW_SIZE, dtype=np.float64)[:, None]  # (960, 1)
    k = np.arange(FREQ_SIZE, dtype=np.float64)[None, :]  # (1, 481)
    ang = 2.0 * np.pi * n * k / WINDOW_SIZE
    cos, sin = np.cos(ang), np.sin(ang)  # (960, 481)
    fwd = np.concatenate([cos, -sin], axis=1)  # (960, 962)

    herm = np.full((FREQ_SIZE,), 2.0)
    herm[0] = herm[-1] = 1.0
    inv_re = (herm[:, None] * cos.T) * 0.5  # (481, 960)
    inv_im = (herm[:, None] * -sin.T) * 0.5
    inv = np.concatenate([inv_re, inv_im], axis=0)  # (962, 960)
    return fwd.astype(np.float32), inv.astype(np.float32)


_FWD_DFT, _INV_DFT = _build_dft_matrices()
_FWD = jnp.asarray(_FWD_DFT)
_INV = jnp.asarray(_INV_DFT)
_WINDOW = jnp.asarray(VORBIS_WINDOW)  # (960,)
_WNORM = jnp.float32(WNORM)


def forward_transform(frame: jnp.ndarray) -> jnp.ndarray:
    """Window a (..., 960) time frame -> packed (..., 2, 481) spectrum."""
    windowed = frame * _WINDOW
    flat = matmul(windowed, _FWD) * _WNORM  # (..., 962)
    return flat.reshape(flat.shape[:-1] + (2, FREQ_SIZE))


def inverse_transform(spectrum: jnp.ndarray) -> jnp.ndarray:
    """Packed (..., 2, 481) spectrum -> windowed (..., 960) time frame.

    Includes the reference's /2 post-scale and the synthesis windowing.
    """
    flat = spectrum.reshape(spectrum.shape[:-2] + (2 * FREQ_SIZE,))
    y = matmul(flat, _INV)
    return y * _WINDOW
