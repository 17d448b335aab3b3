"""Band aggregation / interpolation / DCT as dense matmuls.

The reference's triangular-weighted band loops (src/lib.rs:65-97) and the
22-point brute-force DCT (lib.rs:139-148) are re-expressed as dense matrix
products against precomputed (22,481)/(481,22)/(22,22) constants — single
MXU-friendly ops instead of scalar loops.  All functions broadcast over
leading batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from .precision import matmul
from ..tables import BAND_CORR_MATRIX, BAND_INTERP_MATRIX, DCT_SCALE, DCT_TABLE

_CORR = jnp.asarray(BAND_CORR_MATRIX)  # (22, 481)
_INTERP = jnp.asarray(BAND_INTERP_MATRIX)  # (481, 22)
_DCT = jnp.asarray(DCT_TABLE)  # (22, 22), [i, j] = cos((i+0.5) j pi/22)


def band_corr(x: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Per-band correlation of two packed spectra (..., 2, 481) -> (..., 22).

    Spectra are packed real tensors (index 0 = real, 1 = imag; see
    ops/fft.py).  Equivalent to the reference's compute_band_corr
    (lib.rs:65-82) including the x2 weighting of the first and last band
    (baked into the matrix).
    """
    corr = jnp.sum(x * p, axis=-2)  # re*re + im*im, (..., 481)
    return matmul(corr, _CORR.T)


def band_energies(x: jnp.ndarray) -> jnp.ndarray:
    """Band energies of a packed (..., 2, 481) spectrum: band_corr(x, x)."""
    power = jnp.sum(x * x, axis=-2)
    return matmul(power, _CORR.T)


_CORR2 = jnp.concatenate([_CORR.T, _CORR.T], axis=0)  # (962, 22)


def band_energies_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Band energies of a flat-packed (..., 962) spectrum [re|im].

    Same result as :func:`band_energies` without the (..., 2, 481)
    reshape/sum (one matmul against the doubled matrix) — the layout the
    chunk precompute and the fused kernel carry spectra in.
    """
    return matmul(x * x, _CORR2)


def interp_band_gain(band_vals: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation of 22 band values to 481 bins (..., 22)->(...,481).

    Bins >= 400 are zero, matching the reference's zero-fill semantics
    (lib.rs:84-97).
    """
    return matmul(band_vals, _INTERP.T)


def dct22(x: jnp.ndarray) -> jnp.ndarray:
    """Forward 22-point DCT-II: out[i] = (sum_j x[j] * T[j,i]) * sqrt(2/22)."""
    return matmul(x, _DCT) * DCT_SCALE
