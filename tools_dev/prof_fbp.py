import time, sys
import numpy as np
import jax, jax.numpy as jnp
from nnnoiseless_tpu.ops.pitch import sliding_dot
N = int(sys.argv[1]) if len(sys.argv)>1 else 409600
rng = np.random.RandomState(0)
y = jnp.asarray((rng.randn(N,864)*3000).astype(np.float32))
xc = jnp.asarray((rng.randn(N,294)*1e9).astype(np.float32))
jax.block_until_ready((y,xc))
def force(out):
    return [float(jnp.ravel(l)[0]) for l in jax.tree_util.tree_leaves(out)]
def timeit(name, fn, *args):
    out=fn(*args); force(out)
    best=1e9
    for _ in range(3):
        t0=time.perf_counter(); out=fn(*args); force(out); best=min(best,time.perf_counter()-t0)
    print(f"{name:40s} {best*1000:9.1f} ms", flush=True)
    return out
v=jax.vmap
length=480; n_lags=294

def norm_conv(y):
    y2=y*y
    return sliding_dot(jnp.ones((length,),jnp.float32), y2, n_lags)
w = timeit("norm conv (ones kernel, vmap)", jax.jit(v(norm_conv)), y)

def norm_cumsum(y):
    y2=y*y
    p=jnp.concatenate([jnp.zeros((1,),jnp.float32), jnp.cumsum(y2)])
    return p[length:length+n_lags]-p[:n_lags]
timeit("norm via cumsum diff (vmap)", jax.jit(v(norm_cumsum)), y)

def sel(xc, w):
    u=jnp.maximum(1.0+w,1.0)
    q=xc>0.0
    ratio=jnp.where(q,(xc*xc)/u,-jnp.inf)
    best=jnp.argmax(ratio).astype(jnp.int32)
    ratio2=jnp.where(jnp.arange(n_lags,dtype=jnp.int32)==best,-jnp.inf,ratio)
    has2=jnp.any(ratio2>-jnp.inf)
    anyq=jnp.any(q)
    second=jnp.where(has2,jnp.argmax(ratio2).astype(jnp.int32),jnp.where(anyq,jnp.int32(0),jnp.int32(1)))
    return best,second
timeit("selection (argmax chain, vmap)", jax.jit(v(sel)), xc, w)
