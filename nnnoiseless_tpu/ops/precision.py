"""Precision-pinned contraction helpers.

JAX's *default* matmul/conv precision on TPU is single-pass bf16 — far too
lossy for the denoise pipeline's discrete decisions (pitch selection,
silence gate) and its 1e-4 parity oracle.  Every contraction on the signal
path goes through these helpers, pinned to multi-pass bf16 emulation of
f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST
# 3-pass bf16 emulation: ~2^-22 relative error, ~2x the throughput of the
# 6-pass full-f32 emulation on the MXU.  Validated against the golden
# oracle on TPU (tests/test_golden.py + the CLI drive in .claude/skills).
HIGH = jax.lax.Precision.HIGH

dot = functools.partial(jnp.dot, precision=HIGHEST)
matmul = functools.partial(jnp.matmul, precision=HIGH)


def convolve(x, k, mode="full"):
    return jnp.convolve(x, k, mode=mode, precision=HIGH)
