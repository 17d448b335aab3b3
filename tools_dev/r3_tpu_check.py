"""Round-3 TPU check: phase timings (new in-kernel-lag0 architecture) +
golden parity through the production engine, one process.

Bench-style measurement (async chaining, block_until_ready once per timed
call) — numbers comparable to BENCH_r*.
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from nnnoiseless_tpu import RnnModel, init_batch_carry, denoise_audio
from nnnoiseless_tpu.denoise import _precompute_jit, _fused_jit, _two_phase_chunk

model = RnnModel.default()
T = 100


def bench(name, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return out, best


def phases(B):
    rng = np.random.RandomState(0)
    frames = jnp.asarray((rng.randn(B, T, 480) * 3000).astype(np.float32))
    carry = init_batch_carry(model.meta, B)
    jax.block_until_ready((frames,))

    pre_out, t_pre = bench(
        "pre", lambda: _precompute_jit(
            carry.feat.input_mem, carry.feat.hp_mem, frames, False))
    pre, hp = pre_out

    # kernel-only: fresh pre copies each call (donated)
    def kern():
        c = init_batch_carry(model.meta, B)
        p = jax.tree_util.tree_map(jnp.copy, pre)
        jax.block_until_ready(jax.tree_util.tree_leaves(p)[0])
        t0 = time.perf_counter()
        out = _fused_jit(model.params, model.meta, c, p)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        return time.perf_counter() - t0

    _ = kern()
    t_k = min(kern() for _ in range(3))

    c = init_batch_carry(model.meta, B)
    _, t_tot = bench("tot", lambda: _two_phase_chunk(model.params, model.meta, c, frames))
    print(f"B={B:5d}: precompute {t_pre*1e3:7.1f} ms | kernel {t_k*1e3:7.1f} ms"
          f" | two-phase {t_tot*1e3:7.1f} ms = {B*T/t_tot/100:8.1f}x rt",
          flush=True)


for B in (4096, 1024, 128, 1):
    phases(B)

# golden parity through the production engine (fused path, B=1 padded)
raw = np.fromfile("tests/data/testing.raw", "<i2").astype(np.float32)
out = denoise_audio(raw, drop_first_frame=True)
ref = np.fromfile("tests/data/reference_output.raw", "<i2")
o = out.astype(np.int16)
rel = ((ref.astype(np.float64) - o) ** 2).sum() / (o.astype(np.float64) ** 2).sum()
mx = np.abs(ref.astype(np.int32) - o.astype(np.int32)).max()
print(f"golden (B=1 padded fused): rel err {rel:.3e}, max per-sample {mx}", flush=True)

# golden at batch 128 (replicated) through the fused engine
frames = jnp.asarray(np.broadcast_to(
    raw[: 100 * 480].reshape(1, 100, 480), (128, 100, 480)).copy())
c = init_batch_carry(model.meta, 128)
c2, out_b, vad = _two_phase_chunk(model.params, model.meta, c, frames)
o2 = np.asarray(out_b)[0].reshape(-1)[480:].astype(np.int16)
n = min(len(o2), len(ref))
rel2 = ((ref[:n].astype(np.float64) - o2[:n]) ** 2).sum() / (o2[:n].astype(np.float64) ** 2).sum()
mx2 = np.abs(ref[:n].astype(np.int32) - o2[:n].astype(np.int32)).max()
print(f"golden (B=128 fused):      rel err {rel2:.3e}, max per-sample {mx2}", flush=True)
