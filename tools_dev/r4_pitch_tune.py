"""Round-4 pitch-kernel tuning run: sliced-tail basis + block sweep.

ONE TPU process:
1. decision parity of the (sliced-tail) kernel vs the XLA chain on the
   golden clip's real windows (flip counts must be 0, as in tools/attrib);
2. kernel-only timing at production R = 4096*100 for block 128/192/256;
3. full precompute timing (the attrib "prefix<=full" shape) for the
   winner, to compare against the recorded 135.3 ms / 82.9 ms marginal.

Run: python tools_dev/r4_pitch_tune.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from nnnoiseless_tpu.ops.pitch import (
    whiten, pitch_search, doubling_tables, window_energies,
)
from nnnoiseless_tpu.ops.fft import xcorr_dft
from nnnoiseless_tpu.ops.frame_kernel import candidates_pallas
from nnnoiseless_tpu.ops.pitch_kernel import pitch_analysis_pallas
from nnnoiseless_tpu.constants import (
    FRAME_SIZE, PITCH_BUF_SIZE, PITCH_FRAME_DS, PITCH_MAX_DS, PITCH_MAX_PERIOD,
)
from nnnoiseless_tpu.ops.biquad import biquad_filter_frames
from nnnoiseless_tpu.tables import BIQUAD_HP_A, BIQUAD_HP_B

# ---- 1. decision parity on real windows --------------------------------
inp = np.fromfile("tests/data/testing.raw", "<i2").astype(np.float32)
nfr = len(inp) // FRAME_SIZE
fr = jnp.asarray(inp[: nfr * FRAME_SIZE].reshape(1, nfr, FRAME_SIZE))
filt, _ = jax.jit(
    lambda f, h: biquad_filter_frames(f, h, tuple(BIQUAD_HP_A), tuple(BIQUAD_HP_B))
)(fr, jnp.zeros((1, 2), jnp.float32))
sig = np.asarray(filt).reshape(-1)
wins = np.stack(
    [sig[s : s + PITCH_BUF_SIZE] for s in range(0, len(sig) - PITCH_BUF_SIZE, FRAME_SIZE)]
)
ds = wins[:, 0::2].copy()
odd = wins[:, 1::2]
ds[:, 1:] = ((odd[:, :-1] + odd[:, 1:]) * 0.5 + wins[:, 2::2]) * 0.5
ds[:, 0] = (odd[:, 0] * 0.5 + wins[:, 0]) * 0.5
x_raw = jnp.asarray(ds.astype(np.float32))


@jax.jit
def old_chain(flat):
    x_lp = jax.vmap(whiten)(flat)
    corr_shared = xcorr_dft(x_lp[:, PITCH_MAX_DS:], x_lp, PITCH_MAX_DS + 1)
    energies = window_energies(x_lp, PITCH_FRAME_DS, PITCH_MAX_DS + 1)
    search = jax.vmap(pitch_search)(x_lp, corr_shared, energies)
    pitch_idx = PITCH_MAX_PERIOD - search
    corr_full, yy_lookup, xx = jax.vmap(doubling_tables)(x_lp, corr_shared, energies)
    cand = candidates_pallas(corr_full, yy_lookup, xx, pitch_idx)
    return cand, pitch_idx


cand_old, pidx_old = old_chain(x_raw)
cand_new, pidx_new = pitch_analysis_pallas(x_raw)
po, pn = np.asarray(pidx_old), np.asarray(pidx_new)
co, cn = np.asarray(cand_old), np.asarray(cand_new)
flips = int(np.sum(po != pn))
tmask = [0] + list(range(4, 18))
tflips = int(np.sum(co[:, tmask] != cn[:, tmask]))
gmax = float(np.abs(co[:, 46:60] - cn[:, 46:60]).max())
print(
    f"sliced-tail kernel vs XLA chain on {len(po)} real windows: "
    f"pidx flips {flips}, t-lane diffs {tflips}, g1 max|d| {gmax:.2e}",
    flush=True,
)
assert flips == 0 and tflips == 0

# ---- 2. kernel-only timing, block sweep --------------------------------
R = 4096 * 100
rng = np.random.RandomState(0)
big = jnp.asarray((rng.randn(R, 864) * 3000).astype(np.float32))
big.block_until_ready()
force = jax.jit(lambda c, p: jnp.ravel(c)[0] + p[0].astype(jnp.float32))
for block in (128, 192, 256):
    try:
        fn = lambda: pitch_analysis_pallas(big, block=block)
        out = fn()
        float(force(*out))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            float(force(*out))
            best = min(best, time.perf_counter() - t0)
        print(f"pitch kernel block={block}: {best*1000:7.1f} ms", flush=True)
    except Exception as e:  # VMEM overflow etc.
        print(f"pitch kernel block={block}: FAILED ({type(e).__name__}: "
              f"{str(e)[:120]})", flush=True)

# ---- 3. full precompute timing (attrib prefix<=full shape) -------------
from nnnoiseless_tpu.denoise import _precompute_jit
from nnnoiseless_tpu import RnnModel, init_batch_carry

model = RnnModel.default()
B, T = 4096, 100
frames = jnp.asarray((rng.randn(B, T, 480) * 3000).astype(np.float32))
carry = init_batch_carry(model.meta, B)
imem, hpm = carry.feat.input_mem, carry.feat.hp_mem
f2 = jax.jit(lambda p: jax.tree_util.tree_leaves(p)[0].ravel()[0])
out = _precompute_jit(imem, hpm, frames, False)
float(f2(out))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    out = _precompute_jit(imem, hpm, frames, False)
    float(f2(out))
    best = min(best, time.perf_counter() - t0)
print(f"precompute total (B=4096): {best*1000:7.1f} ms  (attrib: 135.3)", flush=True)
print("DONE", flush=True)
