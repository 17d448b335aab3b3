"""Round-5 persistent TPU session: baseline attribution + command loop.

One warm process for the whole round (first compile costs 5-25 min per
process on this backend, docs/PERFORMANCE.md).  After the baseline it
polls /tmp/r5_cmds/ for numbered python files, execs each in this
module's namespace, and writes stdout to /tmp/r5_out/<n>.out (+ .done).

Run: python tools_dev/r5_session.py
Send work: write /tmp/r5_cmds/001.py; poll /tmp/r5_out/001.done
"""
import contextlib
import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nnnoiseless_tpu import RnnModel, init_batch_carry
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


print(f"devices: {jax.devices()}", flush=True)

# ---- baseline: pitch kernel standalone + two-phase totals at 4096 ----------
from nnnoiseless_tpu.ops.pitch_kernel import pitch_analysis_pallas

B = 4096
rng = np.random.RandomState(0)
frames = jnp.asarray((rng.randn(B, T, 480) * 3000).astype(np.float32))
carry = init_batch_carry(model.meta, B)

# realistic whitened-scale windows for kernel-only timing
x_raw = jnp.asarray((rng.randn(B * T // 4, 864) * 3000).astype(np.float32))
x_raw_full = jnp.concatenate([x_raw] * 4, axis=0)  # (409600, 864)
force((frames, carry, x_raw_full))

timeit("pitch kernel standalone R=409600", lambda: pitch_analysis_pallas(x_raw_full), B)
t_pre = timeit("precompute", lambda: _precompute_jit(
    carry.feat.input_mem, carry.feat.hp_mem, frames, False), B)
t_tot = timeit("two-phase total", lambda: _two_phase_chunk(
    model.params, model.meta, carry, frames), B)

# fused kernel standalone (pre computed once, then timed with fresh copies —
# _fused_jit donates pre, so rebuild it each call OUTSIDE the timer)
from nnnoiseless_tpu.ops.frame_kernel import run_fused_scan

pre, hp = _precompute_jit(carry.feat.input_mem, carry.feat.hp_mem, frames, False)
force(pre)
timeit("fused kernel standalone", lambda: run_fused_scan(
    model.params, model.meta, carry, pre), B)
print(f"baseline done: pre {t_pre*1000:.1f} ms, total {t_tot*1000:.1f} ms",
      flush=True)

# ---- command loop -----------------------------------------------------------
CMD_DIR = "/tmp/r5_cmds"
OUT_DIR = "/tmp/r5_out"
os.makedirs(CMD_DIR, exist_ok=True)
os.makedirs(OUT_DIR, exist_ok=True)
seen = set()
print("command loop ready", flush=True)
while True:
    for fn in sorted(os.listdir(CMD_DIR)):
        if not fn.endswith(".py") or fn in seen:
            continue
        seen.add(fn)
        tag = fn[:-3]
        buf = io.StringIO()
        t0 = time.time()
        try:
            with open(os.path.join(CMD_DIR, fn)) as f:
                code = f.read()
            with contextlib.redirect_stdout(buf):
                exec(compile(code, fn, "exec"), globals())
            status = "ok"
        except Exception:
            buf.write(traceback.format_exc())
            status = "error"
        with open(os.path.join(OUT_DIR, tag + ".out"), "w") as f:
            f.write(buf.getvalue())
        with open(os.path.join(OUT_DIR, tag + ".done"), "w") as f:
            f.write(f"{status} {time.time()-t0:.1f}s\n")
        print(f"[{tag}] {status}", flush=True)
    time.sleep(2)
