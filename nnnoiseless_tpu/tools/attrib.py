"""Engine attribution: parity + stage timing in ONE TPU process.

The standing perf-truth tool (run each round; results go to
docs/PERFORMANCE.md):

1. golden parity through the production engine (fused pitch Pallas
   kernel + fused frame kernel, the default path);
2. pitch-decision agreement between the fused pitch kernel and the XLA
   escape-hatch chain on the golden clip's real windows (flip count);
3. two-phase totals at B=4096/1024;
4. CUMULATIVE-PREFIX attribution of the precompute (biquad -> frame
   windows -> ds windows -> pitch kernel), plus the XLA pitch chain
   timed in the same process for the delta;
5. fused-kernel stage bisection via the ``skip`` knob.

Run from the repo root:  python -m nnnoiseless_tpu.tools.attrib
"""
import time
import numpy as np
import jax, jax.numpy as jnp

from nnnoiseless_tpu import RnnModel, init_batch_carry, denoise_audio
from nnnoiseless_tpu.denoise import _precompute_jit, _two_phase_chunk

model = RnnModel.default()
T = 100
_chk_cache = {}


def force(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    key = len(leaves)
    if key not in _chk_cache:
        _chk_cache[key] = jax.jit(
            lambda ls: sum(jnp.ravel(l)[0].astype(jnp.float32) for l in ls)
        )
    return float(_chk_cache[key](leaves))


def timeit(name, fn, B, n=3):
    out = fn()
    force(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        force(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best*1000:9.1f} ms   ({B*T/best/100:.0f}x rt)", flush=True)
    return best


# ---- 1. golden parity -------------------------------------------------------
inp = np.fromfile("tests/data/testing.raw", "<i2").astype(np.float32)
ref = np.fromfile("tests/data/reference_output.raw", "<i2").astype(np.float32)
out = denoise_audio(inp)
n = min(len(out), len(ref))
d = out[:n] - ref[:n]
rel = float(np.sum(d * d) / np.sum(ref[:n] ** 2))
print(f"golden: rel {rel:.3e}  max |d| {np.abs(d).max():.1f}", flush=True)
assert rel < 1e-4, rel

# ---- 2. pitch-decision agreement on real windows ---------------------------
from nnnoiseless_tpu.ops.pitch import (
    whiten, pitch_search, doubling_tables, window_energies,
)
from nnnoiseless_tpu.ops.fft import xcorr_dft
from nnnoiseless_tpu.ops.frame_kernel import candidates_pallas
from nnnoiseless_tpu.ops.pitch_kernel import pitch_analysis_pallas
from nnnoiseless_tpu.constants import (
    FRAME_SIZE, PITCH_BUF_SIZE, PITCH_FRAME_DS, PITCH_MAX_DS,
    PITCH_MAX_PERIOD,
)
from nnnoiseless_tpu.ops.biquad import biquad_filter_frames
from nnnoiseless_tpu.tables import BIQUAD_HP_A, BIQUAD_HP_B

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
x_raw = jnp.asarray(ds.astype(np.float32))  # (R, 864) real downsampled windows


@jax.jit
def old_chain(flat):
    x_lp = jax.vmap(whiten)(flat)
    corr_shared = xcorr_dft(x_lp[:, PITCH_MAX_DS:], x_lp, PITCH_MAX_DS + 1)
    energies = window_energies(x_lp, PITCH_FRAME_DS, PITCH_MAX_DS + 1)
    search = jax.vmap(pitch_search)(x_lp, corr_shared, energies)
    pitch_idx = PITCH_MAX_PERIOD - search
    corr_full, yy_lookup, xx = jax.vmap(doubling_tables)(
        x_lp, corr_shared, energies
    )
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
    f"pitch agreement on {len(po)} real windows: pidx flips {flips}, "
    f"t-lane diffs {tflips}, g1 max|d| {gmax:.2e}",
    flush=True,
)

# ---- 3. totals --------------------------------------------------------------
for B in (4096, 1024):
    rng = np.random.RandomState(0)
    frames = jnp.asarray((rng.randn(B, T, 480) * 3000).astype(np.float32))
    carry = init_batch_carry(model.meta, B)
    force((frames, carry))
    timeit(f"[B={B}] precompute", lambda: _precompute_jit(
        carry.feat.input_mem, carry.feat.hp_mem, frames, False), B)
    timeit(f"[B={B}] two-phase total", lambda: _two_phase_chunk(
        model.params, model.meta, carry, frames), B)

# ---- 4. prefix attribution at 4096 ------------------------------------------
from nnnoiseless_tpu.chunk import _frame_windows, _DS_WIN

B = 4096
rng = np.random.RandomState(0)
frames = jnp.asarray((rng.randn(B, T, 480) * 3000).astype(np.float32))
carry = init_batch_carry(model.meta, B)
imem, hpm = carry.feat.input_mem, carry.feat.hp_mem
force((frames, imem, hpm))


def prefix(stop):
    def f(input_mem, hp_mem, fr):
        b, t, _ = fr.shape
        filtered, hp_out = biquad_filter_frames(
            fr, hp_mem, tuple(BIQUAD_HP_A), tuple(BIQUAD_HP_B)
        )
        if stop == "biquad":
            return filtered, hp_out
        full = jnp.concatenate(
            [input_mem, filtered.reshape(b, t * FRAME_SIZE)], axis=1
        )
        filtered_tm = jnp.swapaxes(filtered, 0, 1)  # matches chunk.py
        if stop == "fwin":
            return filtered_tm, hp_out
        even = full[:, 0::2]
        odd = full[:, 1::2]
        prev_odd = jnp.concatenate([jnp.zeros((b, 1), jnp.float32), odd[:, :-1]], axis=1)
        ds = ((prev_odd + odd) * 0.5 + even) * 0.5
        x_lp_raw = _frame_windows(ds, t, FRAME_SIZE // 2, _DS_WIN, FRAME_SIZE // 2)
        starts = FRAME_SIZE * (jnp.arange(t, dtype=jnp.int32) + 1)
        even0 = full[:, starts].T
        odd0 = full[:, starts + 1].T
        x_lp_raw = x_lp_raw.at[..., 0].set((odd0 * 0.5 + even0) * 0.5)
        if stop == "dswin":
            return filtered_tm, x_lp_raw, hp_out
        flat = x_lp_raw.reshape(t * b, _DS_WIN)
        if stop == "oldchain":
            cand, _ = old_chain.__wrapped__(flat)
            return filtered_tm, cand.reshape(t, b, -1), hp_out
        cand, _ = pitch_analysis_pallas(flat)
        return filtered_tm, cand.reshape(t, b, -1), hp_out
    return jax.jit(f)


prev = 0.0
for stop in ("biquad", "fwin", "dswin", "full"):
    fn = prefix(stop)
    tbest = timeit(f"prefix<={stop}", lambda: fn(imem, hpm, frames), B)
    print(f"   marginal {stop}: {1000*(tbest-prev):+.1f} ms", flush=True)
    prev = tbest
fn = prefix("oldchain")
timeit("prefix<=oldchain (XLA pitch stack)", lambda: fn(imem, hpm, frames), B)

# ---- 5. kernel stage bisection at 4096 --------------------------------------
from nnnoiseless_tpu.ops.frame_kernel import run_fused_scan

pre, hp = _precompute_jit(imem, hpm, frames, False)
force(pre)
base = None
for skip in ((), ("lag0",), ("dft",), ("rd",), ("feat",), ("rnn",), ("inv",)):
    tbest = timeit(
        f"kernel skip={','.join(skip) or 'none'}",
        lambda: run_fused_scan(model.params, model.meta, carry, pre, skip=skip),
        B,
    )
    if not skip:
        base = tbest
    else:
        print(f"   stage cost ~{1000*(base-tbest):+.1f} ms", flush=True)
