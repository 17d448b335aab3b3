"""Micro-profile with forced host readback (axon block_until_ready may not
reflect remote completion)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from nnnoiseless_tpu.ops.pitch import sliding_dot, find_best_pitch, pitch_search, whiten, doubling_tables
from nnnoiseless_tpu.constants import MAX_PITCH, PITCH_FRAME_DS, PITCH_MAX_DS

N = int(sys.argv[1]) if len(sys.argv)>1 else 409600
rng = np.random.RandomState(0)
buf = jnp.asarray((rng.randn(N, 864)*3000).astype(np.float32))
jax.block_until_ready(buf)

def force(out):
    leaves = jax.tree_util.tree_leaves(out)
    return [float(jnp.ravel(l)[0]) for l in leaves]

def timeit(name, fn, *args):
    out = fn(*args); force(out)
    best=1e9
    for _ in range(3):
        t0=time.perf_counter(); out=fn(*args); force(out)
        best=min(best,time.perf_counter()-t0)
    print(f"{name:36s} {best*1000:9.1f} ms", flush=True)
    return out

v = jax.vmap
x_lp = buf[:, PITCH_MAX_DS:]
x_lp4 = x_lp[:, 0::2][:, :240]
y_lp4 = buf[:, 0::2][:, :387]
jax.block_until_ready((x_lp, x_lp4, y_lp4))

timeit("noop (dispatch+readback floor)", jax.jit(lambda b: b[:, 0] + 1.0), buf)
xc4 = timeit("coarse conv (240x147)", jax.jit(v(lambda x, y: sliding_dot(x, y, MAX_PITCH//4))), x_lp4, y_lp4)
xc2 = timeit("fine conv (480x294)", jax.jit(v(lambda x, y: sliding_dot(x, y, MAX_PITCH//2))), x_lp, buf)
timeit("find_best_pitch coarse", jax.jit(v(lambda xc, y: find_best_pitch(xc, y, PITCH_FRAME_DS//2))), xc4, y_lp4)
timeit("find_best_pitch fine", jax.jit(v(lambda xc, y: find_best_pitch(xc, y, PITCH_FRAME_DS))), xc2, buf)
timeit("pitch_search full", jax.jit(v(pitch_search)), buf)
timeit("whiten", jax.jit(v(whiten)), buf)
timeit("doubling_tables", jax.jit(v(doubling_tables)), buf)
