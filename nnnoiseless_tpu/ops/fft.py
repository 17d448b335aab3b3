"""Windowed real FFT analysis / synthesis with the reference normalization.

The reference uses an unnormalized 960-point real FFT, scales the forward
transform by ``wnorm = 1/sum(w^2)`` and divides the (unnormalized) inverse by
2 (src/features.rs:281-298, 263-275).  ``jnp.fft.irfft`` normalizes by 1/N,
so the inverse here multiplies by N/2 = 480.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import WINDOW_SIZE
from ..tables import VORBIS_WINDOW, WNORM

_WINDOW = jnp.asarray(VORBIS_WINDOW)  # (960,)
_WNORM = jnp.float32(WNORM)
_INV_SCALE = jnp.float32(WINDOW_SIZE / 2)  # 480


def forward_transform(frame: jnp.ndarray) -> jnp.ndarray:
    """Window a (..., 960) time frame and return the (..., 481) spectrum."""
    windowed = frame * _WINDOW
    return jnp.fft.rfft(windowed, axis=-1) * _WNORM


def inverse_transform(spectrum: jnp.ndarray) -> jnp.ndarray:
    """(..., 481) spectrum -> windowed (..., 960) time frame.

    Includes the reference's /2 post-scale and the synthesis windowing.
    """
    y = jnp.fft.irfft(spectrum, n=WINDOW_SIZE, axis=-1) * _INV_SCALE
    return y * _WINDOW
