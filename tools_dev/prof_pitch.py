"""Micro-profile pitch_search internals on TPU at B*T rows."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from nnnoiseless_tpu.ops.pitch import sliding_dot, find_best_pitch, pitch_search
from nnnoiseless_tpu.constants import MAX_PITCH, PITCH_FRAME_DS, PITCH_MAX_DS

N = int(sys.argv[1]) if len(sys.argv)>1 else 409600
rng = np.random.RandomState(0)
buf = jnp.asarray((rng.randn(N, 864)*3000).astype(np.float32))

def timeit(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    best=1e9
    for _ in range(3):
        t0=time.perf_counter(); out=fn(*args); jax.block_until_ready(out)
        best=min(best,time.perf_counter()-t0)
    print(f"{name:36s} {best*1000:9.1f} ms", flush=True)
    return out

v = jax.vmap
# pieces
x_lp = buf[:, PITCH_MAX_DS:]          # (N,480)
x_lp4 = x_lp[:, 0::2][:, :240]
y_lp4 = buf[:, 0::2][:, :387]

f1 = jax.jit(v(lambda x, y: sliding_dot(x, y, MAX_PITCH//4)))
xc4 = timeit("coarse conv (240x147)", f1, x_lp4, y_lp4)

f2 = jax.jit(v(lambda x, y: sliding_dot(x, y, MAX_PITCH//2)))
xc2 = timeit("fine conv (480x294)", f2, x_lp, buf)

f3 = jax.jit(v(lambda xc, y: find_best_pitch(xc, y, PITCH_FRAME_DS//2)))
bp = timeit("find_best_pitch coarse", f3, xc4, y_lp4)

f4 = jax.jit(v(lambda xc, y: find_best_pitch(xc, y, PITCH_FRAME_DS)))
bp2 = timeit("find_best_pitch fine", f4, xc2, buf)

# norm conv alone (the ones-kernel sliding window sums)
f5 = jax.jit(v(lambda y: sliding_dot(jnp.ones((480,), jnp.float32), y*y, 294)))
timeit("norm conv fine (ones 480x294)", f5, buf)

f6 = jax.jit(v(pitch_search))
timeit("pitch_search full", f6, buf)
