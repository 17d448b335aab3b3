"""Round-3 data-generator device-time measurement (VERDICT item 7).

Regenerates the 120k-frame demo corpus (round-2 scale: 6 voices, 5 noises
— examples/train_synthetic.py defaults) and records the device/host time
split of training.data.generate.  Run on the real TPU; one process.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import importlib.util

spec = importlib.util.spec_from_file_location(
    "train_synthetic", "/root/repo/examples/train_synthetic.py"
)
ts = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ts)

from nnnoiseless_tpu.training.data import generate

work = "/tmp/nnt_datagen_time"
os.makedirs(work, exist_ok=True)
rng = np.random.RandomState(7)
sig_paths, noise_paths = [], []
for i in range(6):
    p = os.path.join(work, f"v{i}.wav")
    if not os.path.exists(p):
        ts.write_wav(p, ts.synth_voice(rng, seconds=30.0))
    sig_paths.append(p)
for i, kind in enumerate(["white", "pink", "band", "white", "pink"]):
    p = os.path.join(work, f"n{i}.wav")
    if not os.path.exists(p):
        ts.write_wav(p, ts.synth_noise(rng, kind, seconds=30.0))
    noise_paths.append(p)

# Warmup: compile the (24, 500, 480) feature program once (axon charges
# minutes for the first compile; the timed run must see zero compiles,
# which is also why chunk=500 — it divides 120000/8 exactly, so the timed
# run never hits a differently-shaped tail chunk).
generate(sig_paths, noise_paths, 8 * 500, seed=0, workers=8, chunk=500)
print("warmup done", flush=True)

timing = {}
t0 = time.time()
data = generate(
    sig_paths, noise_paths, 120_000, seed=0, workers=8, chunk=500,
    timing=timing,
    progress=lambda n: print(f"  {n}/120000\r", end="", flush=True),
)
wall = time.time() - t0
print(
    f"\n120k rows: wall {wall:.1f}s  device {timing['device_s']:.1f}s  "
    f"host-sim {timing['host_s']:.1f}s  shape {data.shape}",
    flush=True,
)
assert data.shape == (120_000, 87) and np.all(np.isfinite(data))
