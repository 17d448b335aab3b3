"""Hardware check for the closed-form-carry biquad (round 4).

Measures, in ONE TPU process:
1. f64-oracle precision of biquad_filter_frames at batch 1/64/128/4096
   (the test_precision_tpu bar is <= 1.5 i16 units at sigma=3000);
2. timing at B=4096, T=100 vs the old T-step-scan form (reconstructed
   inline for the comparison);
3. golden parity through the library engine.

Run: python tools_dev/r4_biquad_check.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

import nnnoiseless_tpu.ops.biquad as bq
from nnnoiseless_tpu.tables import BIQUAD_HP_A, BIQUAD_HP_B
from nnnoiseless_tpu.constants import FRAME_SIZE

A = tuple(float(v) for v in BIQUAD_HP_A)
B_ = tuple(float(v) for v in BIQUAD_HP_B)


def oracle_f64(x, a, b):
    y = np.empty_like(x, np.float64)
    m0 = np.zeros(x.shape[:-1])
    m1 = np.zeros(x.shape[:-1])
    for n in range(x.shape[-1]):
        xn = x[..., n].astype(np.float64)
        yn = xn + m0
        m0 = m1 + (b[0] * xn - a[0] * yn)
        m1 = b[1] * xn - a[1] * yn
        y[..., n] = yn
    return y


# ---- 1. precision ------------------------------------------------------
new_jit = jax.jit(lambda fr, hp: bq.biquad_filter_frames(fr, hp, A, B_))
for batch in (1, 64, 128, 4096):
    t = 8
    rng = np.random.RandomState(batch)
    frames = (rng.randn(batch, t, FRAME_SIZE) * 3000).astype(np.float32)
    got, _ = new_jit(jnp.asarray(frames), jnp.zeros((batch, 2), jnp.float32))
    want = oracle_f64(frames.reshape(batch, t * FRAME_SIZE), A, B_)
    err = np.abs(np.asarray(got, np.float64).reshape(batch, -1) - want).max()
    print(f"closed-form biquad vs f64 oracle, batch {batch}: max {err:.3f}", flush=True)
    assert err <= 2.0, err  # decision bar is 1.5; see log for actuals


# ---- 2. timing vs the old scan form ------------------------------------
def old_form(frames, mem):
    n = frames.shape[-1]
    W, P, H, Q = (jnp.asarray(t) for t in bq._linear_biquad_tables(*A, *B_, n))
    hp = jax.lax.Precision.HIGHEST
    xw = jnp.matmul(frames, W, precision=hp)
    xh = jnp.matmul(frames, H, precision=hp)

    def step(m, xh_t):
        return jnp.matmul(m, Q, precision=hp) + xh_t, m

    mem_out, mems = jax.lax.scan(step, mem, jnp.swapaxes(xh, 0, 1))
    mems = jnp.swapaxes(mems, 0, 1)
    return frames + xw + jnp.matmul(mems, P, precision=hp), mem_out


old_jit = jax.jit(old_form)
Bt, T = 4096, 100
rng = np.random.RandomState(0)
fr = jnp.asarray((rng.randn(Bt, T, FRAME_SIZE) * 3000).astype(np.float32))
hp0 = jnp.zeros((Bt, 2), jnp.float32)
force = jax.jit(lambda y: jnp.ravel(y[0])[0] + jnp.ravel(y[1])[0])
for name, fn in (("old scan-carry", old_jit), ("new closed-form", new_jit)):
    out = fn(fr, hp0)
    float(force(out))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(fr, hp0)
        float(force(out))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:18s} B={Bt} T={T}: {best*1000:7.1f} ms", flush=True)

# ---- 3. golden through the library engine ------------------------------
from nnnoiseless_tpu import denoise_audio

inp = np.fromfile("tests/data/testing.raw", "<i2").astype(np.float32)
ref = np.fromfile("tests/data/reference_output.raw", "<i2").astype(np.float32)
out = denoise_audio(inp)
n = min(len(out), len(ref))
d = out[:n] - ref[:n]
rel = float(np.sum(d * d) / np.sum(ref[:n] ** 2))
print(f"golden: rel {rel:.3e}  max |d| {np.abs(d).max():.1f}", flush=True)
assert rel < 1e-4
print("DONE", flush=True)
