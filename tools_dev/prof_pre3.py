"""Stage timing of precompute v3 (split-basis lag-0 DFT), readback-synced."""
import time, sys
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from nnnoiseless_tpu import RnnModel, init_batch_carry
from nnnoiseless_tpu.chunk import _frame_windows, _DS_WIN, precompute_chunk
from nnnoiseless_tpu.ops.biquad import biquad_filter_frames
from nnnoiseless_tpu.ops.fft import dense_dft_bases, xcorr_dft
from nnnoiseless_tpu.ops.bands import band_energies_flat, dct22
from nnnoiseless_tpu.ops.pitch import whiten, pitch_search, doubling_tables
from nnnoiseless_tpu.pipeline import log_spectrum
from nnnoiseless_tpu.tables import BIQUAD_HP_A, BIQUAD_HP_B
from nnnoiseless_tpu.constants import FRAME_SIZE, PITCH_BUF_SIZE, PITCH_MAX_DS, WINDOW_SIZE

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
    print(f"{name:34s} {best*1000:9.1f} ms", flush=True)
    return out

@jax.jit
def mk_full(fr, hp, im):
    filtered, hp_out = biquad_filter_frames(fr, hp, tuple(BIQUAD_HP_A), tuple(BIQUAD_HP_B))
    return jnp.concatenate([im, filtered.reshape(B, T*FRAME_SIZE)], axis=1)
full = timeit("biquad+full", mk_full, frames, carry.feat.hp_mem, carry.feat.input_mem)

f_ftm = jax.jit(lambda fu: _frame_windows(fu, T, PITCH_BUF_SIZE, FRAME_SIZE, FRAME_SIZE))
ftm = timeit("filtered_tm stack", f_ftm, full)

Fb = jnp.asarray(dense_dft_bases()[0])
im = carry.feat.input_mem
@jax.jit
def f_spec(ftm, im):
    first_prev = im[:, PITCH_BUF_SIZE - WINDOW_SIZE + FRAME_SIZE:]
    fprev = jnp.concatenate([first_prev[None], ftm[:-1]], axis=0)
    prec = jax.lax.Precision.HIGHEST
    return (jnp.matmul(fprev, Fb[:FRAME_SIZE], precision=prec)
            + jnp.matmul(ftm, Fb[FRAME_SIZE:], precision=prec))
x = timeit("lag0 split matmul (HIGHEST)", f_spec, ftm, im)

@jax.jit
def post(x):
    ex = band_energies_flat(x)
    ly, e = log_spectrum(ex)
    ceps = dct22(ly)
    return ex, e < 0.04, ceps
timeit("bands+log+ceps", post, x)
del x

@jax.jit
def mk_xlp(full):
    even = full[:, 0::2]; odd = full[:, 1::2]
    prev_odd = jnp.concatenate([jnp.zeros((B, 1), jnp.float32), odd[:, :-1]], axis=1)
    ds = ((prev_odd + odd) * 0.5 + even) * 0.5
    return _frame_windows(ds, T, FRAME_SIZE // 2, _DS_WIN, FRAME_SIZE // 2).reshape(T * B, _DS_WIN)
flat = timeit("ds+window stack", mk_xlp, full)
xlp = timeit("whiten", jax.jit(jax.vmap(whiten)), flat)
del flat
corr = timeit("xcorr_dft 385", jax.jit(lambda v: xcorr_dft(v[:, PITCH_MAX_DS:], v, PITCH_MAX_DS + 1)), xlp)
timeit("pitch_search (w/ shared corr)", jax.jit(jax.vmap(pitch_search)), xlp, corr)
timeit("doubling_tables (w/ corr)", jax.jit(jax.vmap(doubling_tables)), xlp, corr)
del corr, xlp
f_pre = jax.jit(lambda im, hp, fr: precompute_chunk(im, hp, fr))
timeit("precompute_chunk full", f_pre, carry.feat.input_mem, carry.feat.hp_mem, frames)
f_pre0 = jax.jit(lambda im, hp, fr: precompute_chunk(im, hp, fr, lag0=False))
timeit("precompute_chunk lag0=False", f_pre0, carry.feat.input_mem, carry.feat.hp_mem, frames)

# candidates builder (TPU pallas path)
from nnnoiseless_tpu.ops.frame_kernel import candidates_pallas
flat2 = jax.jit(lambda fu: mk_xlp(fu))(full)
xlp2 = jax.jit(jax.vmap(whiten))(flat2)
corr2 = jax.jit(lambda v: xcorr_dft(v[:, PITCH_MAX_DS:], v, PITCH_MAX_DS + 1))(xlp2)
tabs = jax.jit(jax.vmap(doubling_tables))(xlp2, corr2)
pidx2 = jax.jit(lambda x, c: jax.vmap(pitch_search)(x, c))(xlp2, corr2)
import jax.numpy as jnp2
pidx2 = 768 - pidx2
timeit("candidates_pallas", jax.jit(candidates_pallas), tabs[0], tabs[1], tabs[2], pidx2)
