"""Round-4 staged TPU bring-up: compile + run each engine phase separately.

Prints a timestamped line per stage so a hang is attributable.  Run:
    python tools_dev/r4_tpu_check.py
"""

import sys
import time

t00 = time.time()


def log(msg):
    print(f"[{time.time() - t00:7.1f}s] {msg}", flush=True)


import numpy as np

log("importing jax...")
import jax
import jax.numpy as jnp

log(f"devices: {jax.devices()}")

log("stage 1: pitch kernel alone (128 rows)")
from nnnoiseless_tpu.ops.pitch_kernel import pitch_analysis_pallas

x = jnp.asarray(np.random.RandomState(0).randn(128, 864).astype(np.float32))
t0 = time.time()
cand, pidx = pitch_analysis_pallas(x)
cand.block_until_ready()
log(f"  compiled+ran in {time.time() - t0:.1f}s; pidx[:4]={np.asarray(pidx[:4])}")

log("stage 2: precompute_chunk jit (B=128, T=10, lag0=False)")
from nnnoiseless_tpu.denoise import _precompute_jit
from nnnoiseless_tpu import RnnModel, init_batch_carry

model = RnnModel.default()
carry = init_batch_carry(model.meta, 128)
frames = jnp.asarray(
    (np.random.RandomState(1).randn(128, 10, 480) * 3000).astype(np.float32)
)
t0 = time.time()
pre, hp = _precompute_jit(carry.feat.input_mem, carry.feat.hp_mem, frames, False)
jax.block_until_ready(pre)
log(f"  compiled+ran in {time.time() - t0:.1f}s")

log("stage 3: fused frame kernel (B=128, T=10)")
from nnnoiseless_tpu.denoise import _fused_jit

t0 = time.time()
c2, out, vad = _fused_jit(model.params, model.meta, carry, pre)
out.block_until_ready()
log(f"  compiled+ran in {time.time() - t0:.1f}s; out[0,0,:3]={np.asarray(out[0, 0, :3])}")

log("stage 4: golden clip through the production path (B=1)")
from nnnoiseless_tpu import denoise_audio

raw = np.fromfile("tests/data/testing.raw", dtype="<i2").astype(np.float32)
ref = np.fromfile("tests/data/reference_output.raw", dtype="<i2")
t0 = time.time()
got = denoise_audio(raw, drop_first_frame=True)
log(f"  compiled+ran in {time.time() - t0:.1f}s")
o = got.astype(np.int16)
xx = np.sum(o.astype(np.float64) ** 2)
diff = np.sum((ref.astype(np.float64) - o.astype(np.float64)) ** 2)
delta = np.abs(ref.astype(np.int32) - o.astype(np.int32)).max()
log(f"  golden rel sq err {diff / xx:.3e}, max |delta| {delta} i16 units")
assert diff / xx < 1e-4 and delta <= 3
log("ALL STAGES PASS")
