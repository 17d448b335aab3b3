"""TPU: sweep frames-per-step and block size for the fused kernel."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from nnnoiseless_tpu import RnnModel, init_batch_carry
from nnnoiseless_tpu.chunk import precompute_chunk
from nnnoiseless_tpu.ops.frame_kernel import run_fused_scan

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
T = int(sys.argv[2]) if len(sys.argv) > 2 else 100
rng = np.random.RandomState(0)
frames = jnp.asarray((rng.randn(B, T, 480) * 3000).astype(np.float32))
model = RnnModel.default()
carry = init_batch_carry(model.meta, B)
jax.block_until_ready((frames, carry))

def force(out):
    return [float(jnp.ravel(l)[0]) for l in jax.tree_util.tree_leaves(out)]

def timeit(name, fn, *args, n=3):
    out = fn(*args); force(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); out = fn(*args); force(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:30s} {best*1000:9.1f} ms   ({B*T/best/100:.0f}x rt)", flush=True)
    return out

pre, hp2 = jax.jit(precompute_chunk)(carry.feat.input_mem, carry.feat.hp_mem, frames)
jax.block_until_ready(jax.tree_util.tree_leaves(pre))

for fps in (1, 2, 4):
    for block in (128, 256, 512):
        f = jax.jit(lambda c, p, fps=fps, block=block: run_fused_scan(
            model.params, model.meta, c, p, fps=fps, block=block))
        try:
            timeit(f"fused fps={fps} block={block}", f, carry, pre)
        except Exception as e:
            print(f"fused fps={fps} block={block} FAILED: {str(e)[:200]}", flush=True)
