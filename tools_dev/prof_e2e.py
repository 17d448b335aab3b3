"""End-to-end production timing: precompute vs scan vs old path, readback-synced."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from nnnoiseless_tpu import RnnModel, init_batch_carry
from nnnoiseless_tpu.chunk import precompute_chunk
from nnnoiseless_tpu.pipeline import frame_step_hoisted, frame_step_prefiltered
from nnnoiseless_tpu.ops.biquad import biquad_filter_frames
from nnnoiseless_tpu.tables import BIQUAD_HP_A, BIQUAD_HP_B
from nnnoiseless_tpu.denoise import _scan_batch

B = int(sys.argv[1]) if len(sys.argv)>1 else 4096
T = int(sys.argv[2]) if len(sys.argv)>2 else 100
rng = np.random.RandomState(0)
frames = jnp.asarray((rng.randn(B,T,480)*3000).astype(np.float32))
model = RnnModel.default()
carry = init_batch_carry(model.meta, B)
jax.block_until_ready((frames, carry))

def force(out):
    return [float(jnp.ravel(l)[0]) for l in jax.tree_util.tree_leaves(out)]

def timeit(name, fn, *args, n=3):
    out = fn(*args); force(out)
    best=1e9
    for _ in range(n):
        t0=time.perf_counter(); out=fn(*args); force(out); best=min(best,time.perf_counter()-t0)
    fps = B*T/best
    print(f"{name:28s} {best*1000:9.1f} ms   ({fps/100:.0f}x rt)", flush=True)
    return out

f_full = jax.jit(lambda c, fr: _scan_batch(model.params, model.meta, c, fr))
timeit("NEW full (pre+scan)", f_full, carry, frames)

f_pre = jax.jit(lambda im, hp, fr: precompute_chunk(im, hp, fr))
pre, hp2 = timeit("precompute only", f_pre, carry.feat.input_mem, carry.feat.hp_mem, frames)

@jax.jit
def lean_scan(carry, pre):
    def step(c, pre_t):
        c2, out, vad = jax.vmap(lambda ci, pi: frame_step_hoisted(model.params, model.meta, ci, pi))(c, pre_t)
        return c2, (out, vad)
    xs = jax.tree_util.tree_map(lambda a: jnp.swapaxes(a,0,1), pre)
    c,(out,vad) = jax.lax.scan(step, carry, xs)
    return c, out, vad
timeit("lean scan only", lean_scan, carry, pre)

@jax.jit
def old_scan(carry, frames):
    filtered, hp_out = biquad_filter_frames(frames, carry.feat.hp_mem, tuple(BIQUAD_HP_A), tuple(BIQUAD_HP_B))
    def step(c, f):
        c2, out, vad = jax.vmap(lambda ci, fi: frame_step_prefiltered(model.params, model.meta, ci, fi, ci.feat.hp_mem))(c, f)
        return c2, (out, vad)
    c,(out,vad) = jax.lax.scan(step, carry, jnp.swapaxes(filtered,0,1))
    return c, out, vad
timeit("OLD full scan", old_scan, carry, frames)
