"""Round-4 TPU training-stack record, ONE TPU process (VERDICT items 6+8).

1. data-generator device/host timing split at 120k rows, workers=8
   (the r3 datagen timing measurement, now on the chip);
2. continue generating to the full 480k round-3 corpus;
3. fit ONE seed of the 60-epoch round-3 config on the chip and record
   steps/sec + eval SNR (the round-3 run fell back to host CPU mid-outage
   at ~770 s/seed; this records the chip number).

Results go to docs/TRAINING_RUN.md.  Run: python tools_dev/r4_train_tpu.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import importlib.util

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "train_synthetic", os.path.join(_here, "examples/train_synthetic.py")
)
ts = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ts)

from nnnoiseless_tpu.training.data import generate

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


work = "/tmp/nnt_train_r4"
os.makedirs(work, exist_ok=True)

# ---- round-3 corpus: 18 voices, 12 noises ------------------------------
rng = np.random.RandomState(0)
sig_paths, noise_paths = [], []
for i in range(18):
    p = os.path.join(work, f"voice{i}.wav")
    if not os.path.exists(p):
        ts.write_wav(p, ts.synth_voice(rng) if i < 6 else ts.synth_voice_varied(rng))
    sig_paths.append(p)
kinds = ["white", "pink", "band", "white", "pink"]
for i in range(12):
    p = os.path.join(work, f"noise{i}.wav")
    if not os.path.exists(p):
        ts.write_wav(
            p, ts.synth_noise(rng, kinds[i]) if i < 5 else ts.synth_noise_varied(rng)
        )
    noise_paths.append(p)
log("corpus on disk")

# ---- datagen warmup (first compile; excluded from timing) --------------
generate(sig_paths, noise_paths, 8 * 500, seed=99, workers=8, chunk=500)
log("datagen warmup done (feature program compiled)")

# ---- timed 120k generation: device/host split --------------------------
timing = {}
t0 = time.time()
d120 = generate(
    sig_paths, noise_paths, 120_000, seed=1, workers=8, chunk=500, timing=timing
)
wall120 = time.time() - t0
log(
    f"120k rows: wall {wall120:.1f}s  device {timing['device_s']:.1f}s  "
    f"host-sim {timing['host_s']:.1f}s  ({120_000/wall120:.0f} rows/s)"
)
assert d120.shape == (120_000, 87) and np.all(np.isfinite(d120))

# ---- full 480k corpus (seed 0 = the round-3 configuration) -------------
cache = os.path.join(work, "data480.npz")
if os.path.exists(cache):
    data = np.load(cache)["data"]
    log(f"loaded cached {data.shape}")
else:
    t0 = time.time()
    data = generate(sig_paths, noise_paths, 480_000, seed=0, workers=8, chunk=500)
    log(f"480k rows generated in {time.time()-t0:.1f}s")
    np.savez_compressed(cache, data=data)
    log("cached")

from nnnoiseless_tpu.constants import NB_BANDS, NB_FEATURES
from nnnoiseless_tpu.training.train import fit
from nnnoiseless_tpu.training.network import export_model
from nnnoiseless_tpu import RnnModel, denoise_audio

window, batch_size, epochs = 500, 32, 60
n_seq = len(data) // window
data = data[: n_seq * window]
features = data[:, :NB_FEATURES].reshape(n_seq, window, NB_FEATURES)
gains = data[:, NB_FEATURES : NB_FEATURES + NB_BANDS].reshape(n_seq, window, NB_BANDS)
vad = data[:, NB_FEATURES + 2 * NB_BANDS :].reshape(n_seq, window, 1)

# ---- fit one seed on the chip ------------------------------------------
history = []
t0 = time.time()
params = fit(
    features, gains, vad, epochs=epochs, batch_size=batch_size, seed=0,
    lr_schedule="cosine", log_every=20, history=history,
)
train_s = time.time() - t0
n_steps = len(history) and history[-1][0] + 1 or 0
log(
    f"fit: {train_s:.1f}s for the 60-epoch config "
    f"({history[-1][0]+1 if history else '?'} logged-step index; "
    f"loss {history[0][1]:.2f} -> {history[-1][1]:.3f})"
)

# ---- eval on the held-out mix ------------------------------------------
eval_rng = np.random.RandomState(12345)
clean = ts.synth_voice(eval_rng, seconds=8.0)
noise = ts.synth_noise(eval_rng, "pink", seconds=8.0)
alpha = np.sqrt(np.dot(clean, clean) / (np.dot(noise, noise) * 10 ** 0.5))
noisy = clean + alpha * noise
blob = export_model(params).to_bytes()
out = denoise_audio(noisy, model=RnnModel.from_bytes(blob), drop_first_frame=False)
snr_noisy = ts.snr_db(clean, noisy)
snr = ts.snr_db(clean, out)
result = {
    "datagen_120k_wall_s": round(wall120, 1),
    "datagen_device_s": round(timing["device_s"], 1),
    "datagen_host_s": round(timing["host_s"], 1),
    "train_seconds": round(train_s, 1),
    "steps": 1800,
    "steps_per_sec": round(1800 / train_s, 2),
    "eval_snr_gain_db": round(snr - snr_noisy, 2),
}
log(json.dumps(result))
with open(os.path.join(work, "r4_train_metrics.json"), "w") as f:
    json.dump(result, f)
log("DONE")
