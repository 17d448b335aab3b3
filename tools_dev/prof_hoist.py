"""Stage-by-stage TPU timing of the hoisted chunk path vs the old scan path."""
import time, sys, functools
import numpy as np
import jax, jax.numpy as jnp

from nnnoiseless_tpu import RnnModel, init_batch_carry
from nnnoiseless_tpu.chunk import precompute_chunk, _frame_windows
from nnnoiseless_tpu.ops.biquad import biquad_filter_frames
from nnnoiseless_tpu.ops.fft import forward_transform
from nnnoiseless_tpu.ops.bands import band_energies, dct22
from nnnoiseless_tpu.ops.pitch import whiten, pitch_search, doubling_tables
from nnnoiseless_tpu.pipeline import log_spectrum, frame_step_hoisted, frame_step_prefiltered
from nnnoiseless_tpu.tables import BIQUAD_HP_A, BIQUAD_HP_B
from nnnoiseless_tpu.constants import FRAME_SIZE, PITCH_BUF_SIZE, PITCH_MAX_PERIOD, WINDOW_SIZE

B, T = (int(sys.argv[1]) if len(sys.argv)>1 else 4096), 100
rng = np.random.RandomState(0)
frames = jnp.asarray((rng.randn(B,T,480)*3000).astype(np.float32))
model = RnnModel.default()
carry = init_batch_carry(model.meta, B)

def timeit(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0=time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
        best=min(best, time.perf_counter()-t0)
    print(f"{name:32s} {best*1000:9.1f} ms", flush=True)
    return out

# stage 1: biquad
f_biq = jax.jit(lambda fr, hp: biquad_filter_frames(fr, hp, tuple(BIQUAD_HP_A), tuple(BIQUAD_HP_B)))
filtered, hp_out = timeit("biquad_filter_frames", f_biq, frames, carry.feat.hp_mem)

full = jnp.concatenate([carry.feat.input_mem, filtered.reshape(B, T*480)], axis=1)
jax.block_until_ready(full)

# stage 2: lag0 windows + DFT + bands + log + ceps
@jax.jit
def lag0(full):
    off0 = FRAME_SIZE + (PITCH_BUF_SIZE - WINDOW_SIZE)
    win0 = _frame_windows(full, T, off0, WINDOW_SIZE, FRAME_SIZE)
    x = forward_transform(win0)
    ex = band_energies(x)
    ly, e = log_spectrum(ex)
    ceps = dct22(ly)
    return x, ex, e<0.04, ceps
x, ex, sil, ceps = timeit("lag0 win+dft+bands+log+ceps", lag0, full)

# stage 3: downsample + windows
@jax.jit
def dswin(full):
    even = full[:, 0::2]; odd = full[:, 1::2]
    prev_odd = jnp.concatenate([jnp.zeros((B,1), jnp.float32), odd[:, :-1]], axis=1)
    ds = ((prev_odd+odd)*0.5 + even)*0.5
    return _frame_windows(ds, T, 240, 864, 240)
xlpraw = timeit("downsample+windows", dswin, full)
flat = xlpraw.reshape(B*T, 864)

# stage 4: whiten
f_wh = jax.jit(jax.vmap(whiten))
xlp = timeit("whiten (vmap)", f_wh, flat)

# stage 5: pitch_search
f_ps = jax.jit(jax.vmap(pitch_search))
search = timeit("pitch_search (vmap)", f_ps, xlp)

# stage 6: doubling tables
f_dt = jax.jit(jax.vmap(doubling_tables))
dt = timeit("doubling_tables (vmap)", f_dt, xlp)

# full precompute
f_pre = jax.jit(lambda im, hp, fr: precompute_chunk(im, hp, fr))
pre, hp2 = timeit("precompute_chunk (full)", f_pre, carry.feat.input_mem, carry.feat.hp_mem, frames)

# lean scan alone
@jax.jit
def lean_scan(carry, pre):
    def step(c, pre_t):
        c2, out, vad = jax.vmap(lambda ci, pi: frame_step_hoisted(model.params, model.meta, ci, pi))(c, pre_t)
        return c2, (out, vad)
    xs = jax.tree_util.tree_map(lambda a: jnp.swapaxes(a,0,1), pre)
    c, (out, vad) = jax.lax.scan(step, carry, xs)
    return c, out, vad
timeit("lean scan (alone)", lean_scan, carry, pre)

# old path for comparison
@jax.jit
def old_scan(carry, frames):
    filtered, hp_out = biquad_filter_frames(frames, carry.feat.hp_mem, tuple(BIQUAD_HP_A), tuple(BIQUAD_HP_B))
    def step(c, f):
        c2, out, vad = jax.vmap(lambda ci, fi: frame_step_prefiltered(model.params, model.meta, ci, fi, ci.feat.hp_mem))(c, f)
        return c2, (out, vad)
    c, (out, vad) = jax.lax.scan(step, carry, jnp.swapaxes(filtered,0,1))
    return c, out, vad
timeit("OLD full scan path", old_scan, carry, frames)
