"""Bench-methodology config sweep in one process.

Mirrors bench.py's measurement exactly (donated carry, async chaining,
block_until_ready(out) only) so numbers are comparable to BENCH_r*.
Configs via env knobs read per-call: NNT_TWO_PHASE, NNT_FPS.
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from nnnoiseless_tpu import RnnModel, init_batch_carry
from nnnoiseless_tpu.parallel.mesh import _sharded_chunk

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
T = 100
model = RnnModel.default()
rng = np.random.RandomState(0)
frames = jnp.asarray((rng.randn(B, T, 480) * 3000).astype(np.float32))

configs = [
    {"NNT_TWO_PHASE": "1", "NNT_FPS": "4"},
    {"NNT_TWO_PHASE": "1", "NNT_FPS": "10"},
    {"NNT_TWO_PHASE": "1", "NNT_FPS": "2"},
    {"NNT_TWO_PHASE": "1", "NNT_FPS": "1"},
]
if len(sys.argv) > 2:
    configs = [dict(kv.split("=", 1) for kv in c.split(",")) for c in sys.argv[2].split(";")]

for cfg in configs:
    os.environ.update(cfg)
    carry = init_batch_carry(model.meta, B)
    carry, out, vad = _sharded_chunk(model.params, model.meta, carry, frames)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        carry, out, vad = _sharded_chunk(model.params, model.meta, carry, frames)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    del carry, out, vad
    print(f"{cfg}  {best*1000:8.1f} ms  {B*T/best/100:8.1f}x rt", flush=True)
