"""Bench-methodology phase split: precompute-only vs kernel-only vs total.

Same measurement style as bench.py (async chaining, block_until_ready at
the end of each timed call); each phase timed in steady state.
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from nnnoiseless_tpu import RnnModel, init_batch_carry
from nnnoiseless_tpu.denoise import _precompute_jit, _fused_jit, _two_phase_chunk

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
T = 100
os.environ.setdefault("NNT_FPS", "4")
model = RnnModel.default()
rng = np.random.RandomState(0)
frames = jnp.asarray((rng.randn(B, T, 480) * 3000).astype(np.float32))

def bench(name, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1000:8.1f} ms  {B*T/best/100:8.1f}x rt", flush=True)
    return out

carry = init_batch_carry(model.meta, B)
pre, hp = bench("precompute (lag0=False)", lambda: _precompute_jit(
    carry.feat.input_mem, carry.feat.hp_mem, frames, False))

# kernel-only: fresh (carry, pre) copies each call since _fused_jit donates
def kern():
    c = init_batch_carry(model.meta, B)
    p = jax.tree_util.tree_map(jnp.copy, pre)
    jax.block_until_ready(jax.tree_util.tree_leaves(p)[0])
    t0 = time.perf_counter()
    out = _fused_jit(model.params, model.meta, c, p)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return time.perf_counter() - t0

_ = kern()  # compile
best = min(kern() for _ in range(3))
print(f"{'fused kernel':28s} {best*1000:8.1f} ms  {B*T/best/100:8.1f}x rt", flush=True)

carry = init_batch_carry(model.meta, B)
def total(c):
    return _two_phase_chunk(model.params, model.meta, c, frames)
c2, out, vad = bench("two-phase total", total, carry)
del c2, out, vad
