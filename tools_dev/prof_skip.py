"""TPU: kernel stage attribution via `skip` bisection."""
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
    print(f"{name:36s} {best*1000:9.1f} ms   ({B*T/best/100:.0f}x rt)", flush=True)
    return out

f_pre = jax.jit(lambda im, hp, fr: precompute_chunk(im, hp, fr, lag0=False))
pre, hp2 = f_pre(carry.feat.input_mem, carry.feat.hp_mem, frames)
jax.block_until_ready(jax.tree_util.tree_leaves(pre))

def fused(skip):
    f = jax.jit(lambda c, p: run_fused_scan(model.params, model.meta, c, p, skip=skip))
    return lambda: timeit(f"kernel skip={skip!r}", f, carry, pre)

fused(())()
for s in [('rd',), ('lag0',), ('dft',), ('rnn',), ('feat',), ('comb',), ('inv',),
          ('rd', 'lag0', 'dft', 'rnn', 'feat', 'comb', 'inv')]:
    fused(tuple(s))()
