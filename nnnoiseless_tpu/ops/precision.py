"""Full-f32 contraction helpers.

JAX's default matmul/conv precision trades f32 accuracy for speed (bf16-class
passes on TPU).  The denoise pipeline's decisions (pitch selection, silence
gate) and its parity oracle require true f32 accumulation, so every
contraction on the signal path goes through these helpers.  Throughput is
unaffected at these sizes — the pipeline is latency/bandwidth-bound, not
FLOP-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST

dot = functools.partial(jnp.dot, precision=HIGHEST)
matmul = functools.partial(jnp.matmul, precision=HIGHEST)


def convolve(x, k, mode="full"):
    return jnp.convolve(x, k, mode=mode, precision=HIGHEST)
