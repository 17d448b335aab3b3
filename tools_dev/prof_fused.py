"""TPU: fused-kernel scan vs XLA scan + full path timing."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from nnnoiseless_tpu import RnnModel, init_batch_carry
from nnnoiseless_tpu.chunk import precompute_chunk
from nnnoiseless_tpu.ops.frame_kernel import run_fused_scan
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
    out=fn(*args); force(out)
    best=1e9
    for _ in range(n):
        t0=time.perf_counter(); out=fn(*args); force(out); best=min(best,time.perf_counter()-t0)
    print(f"{name:28s} {best*1000:9.1f} ms   ({B*T/best/100:.0f}x rt)", flush=True)
    return out

f_pre = jax.jit(lambda im, hp, fr: precompute_chunk(im, hp, fr))
pre, hp2 = timeit("precompute", f_pre, carry.feat.input_mem, carry.feat.hp_mem, frames)

f_fused = jax.jit(lambda c, p: run_fused_scan(model.params, model.meta, c, p))
ck, out_k, vad_k = timeit("fused kernel scan", f_fused, carry, pre)

# full production path (dispatches to fused on TPU)
f_full = jax.jit(lambda c, fr: _scan_batch(model.params, model.meta, c, fr))
cf, out_f, vad_f = timeit("full path (pre+fused)", f_full, carry, frames)

# accuracy spot-check vs golden
raw = np.fromfile('tests/data/testing.raw','<i2').astype(np.float32)
from nnnoiseless_tpu import denoise_audio
out = denoise_audio(raw, drop_first_frame=True)
ref = np.fromfile('tests/data/reference_output.raw','<i2')
o = out.astype(np.int16)
print("golden rel err:", ((ref.astype(np.float64)-o)**2).sum()/(o.astype(np.float64)**2).sum())
print("max per-sample:", np.abs(ref.astype(np.int32)-o.astype(np.int32)).max())
