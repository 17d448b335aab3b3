"""Round-4 small-batch latency sweep (VERDICT item 3), ONE TPU process.

Measures the production chunk path at batch 1/8/64 through:
  a) the default fused kernel (block=128, tiny batches padded);
  b) the fused kernel with a small block (block=8/32);
  c) the XLA scan path (NNT_FUSED=0 equivalent, called directly).

Methodology note (first run of this script got it wrong): the completion
barrier must be bench.py's single one-lane readback of the OUTPUT only.
Forcing every carry leaf costs ~a dozen extra tunnel round-trips (~30 ms)
and penalized whichever variant returned more arrays — per
docs/PERFORMANCE.md, only bench.py-style numbers are comparable.

Decision input for routing tiny batches.  Run: python tools_dev/r4_smallbatch.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from nnnoiseless_tpu import RnnModel, init_batch_carry
from nnnoiseless_tpu.denoise import _precompute_jit, _two_phase_chunk
from nnnoiseless_tpu.ops.frame_kernel import run_fused_scan

model = RnnModel.default()
T = 100


def force(out):
    # bench.py's barrier: one scalar readback derived from the final frame.
    return float(jnp.sum(out[:, -1, 0]))


def timeit(name, fn, B, n=5):
    force(fn())
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        force(fn())
        best = min(best, time.perf_counter() - t0)
    print(
        f"{name:40s} {best * 1000:9.1f} ms   ({B * T / best / 100:8.1f}x rt)",
        flush=True,
    )
    return best


@functools.partial(jax.jit, static_argnums=(1, 4))
def fused_block(params, meta, carry, pre, block):
    return run_fused_scan(params, meta, carry, pre, block=block)


@functools.partial(jax.jit, static_argnums=(1,))
def scan_path(params, meta, carry, frames):
    """The XLA scan engine (what NNT_FUSED=0 runs), compiled directly."""
    from nnnoiseless_tpu.chunk import precompute_chunk
    from nnnoiseless_tpu.pipeline import frame_step_hoisted

    pre, hp_out = precompute_chunk(
        carry.feat.input_mem, carry.feat.hp_mem, frames, lag0=True
    )

    def step(c, pre_t):
        c2, out, vad = jax.vmap(
            lambda ci, pi: frame_step_hoisted(params, meta, ci, pi)
        )(c, pre_t)
        return c2, (out, vad)

    carry2, (out, vad) = jax.lax.scan(step, carry, pre)
    return jnp.swapaxes(out, 0, 1)  # (B, T, 480) like the fused path


for B in (1, 8, 64):
    rng = np.random.RandomState(0)
    frames = jnp.asarray((rng.randn(B, T, 480) * 3000).astype(np.float32))
    carry = init_batch_carry(model.meta, B)
    jax.block_until_ready((frames, carry))
    print(f"---- batch {B}", flush=True)
    timeit(f"[B={B}] two-phase default (block=128)",
           lambda: _two_phase_chunk(model.params, model.meta, carry, frames)[1], B)

    def two_phase_small(block):
        pre, hp = _precompute_jit(
            carry.feat.input_mem, carry.feat.hp_mem, frames, False
        )
        return fused_block(model.params, model.meta, carry, pre, block)[1]

    for blk in (8, 32):
        if B <= blk or B % blk == 0:
            timeit(f"[B={B}] two-phase block={blk}",
                   lambda b=blk: two_phase_small(b), B)
    timeit(f"[B={B}] XLA scan path",
           lambda: scan_path(model.params, model.meta, carry, frames), B)
