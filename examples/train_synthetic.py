"""End-to-end training demonstration on a synthetic corpus.

Reproduces the reference's full training pipeline (SURVEY.md C27-C30:
data generator -> Keras-topology fit -> quantized .rnn export) at a scale
that runs in minutes and produces a model that measurably denoises:

1. synthesizes a small speech-like corpus (harmonic voices with pitch and
   amplitude movement, silences) and a noise corpus (white/pink/band-passed)
   as 48 kHz 16-bit WAVs — the formats the data generator requires;
2. runs the training-data generator (training/data.py — the faithful
   re-implementation of src/training.rs) for --count frames;
3. fits the reference topology (training/network.py, same losses/clipping/
   regularizers as train/rnn_train.py) for --epochs epochs;
4. exports int8-quantized weights (model.quantize_weights — the dump_rnn.py
   round-half-even rule) and reloads them as an inference model;
5. evaluates: denoises a held-out noisy mix with the trained model and
   reports SNR before/after (alignment-searched), plus the same metric for
   the shipped default model as an upper reference.

Usage::

    python examples/train_synthetic.py --workdir /tmp/nnt_train_demo \
        --count 150000 --epochs 30

The results of a full run are recorded in docs/TRAINING_RUN.md; the
exported model is committed as tests/data/synthetic_demo.rnn and gated by
tests/test_training.py::test_synthetic_demo_model_denoises.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time
import wave

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def write_wav(path: str, samples: np.ndarray) -> None:
    """48 kHz 16-bit mono PCM."""
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(48_000)
        w.writeframes(
            np.clip(samples, -32767, 32767).astype("<i2").tobytes()
        )


def synth_voice(rng: np.random.RandomState, seconds: float = 30.0) -> np.ndarray:
    """Speech-like signal: harmonic stack with moving f0, vowel-ish
    spectral tilt, syllabic amplitude modulation and pauses."""
    sr = 48_000
    n = int(sr * seconds)
    t = np.arange(n) / sr
    # f0 contour: slow random walk in 80..280 Hz
    f0 = 120.0 * 2 ** np.cumsum(rng.randn(n) * 2e-5)
    f0 = np.clip(f0, 80.0, 280.0)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    sig = np.zeros(n)
    for h in range(1, 13):
        # formant-ish tilt: strongest around harmonics 2-5
        amp = 1.0 / (1.0 + 0.3 * (h - 3.0) ** 2)
        sig += amp * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    # syllabic envelope: ~4 Hz smoothed rectified noise, with real pauses
    env = rng.randn(n // 4800 + 2)
    env = np.repeat(env, 4800)[:n]
    k = int(0.05 * sr)
    env = np.convolve(np.maximum(env, 0), np.ones(k) / k, mode="same")
    gate = np.repeat(rng.rand(n // 9600 + 2) < 0.75, 9600)[:n]
    sig *= env * gate
    return sig / (np.abs(sig).max() + 1e-9) * 12_000


def synth_noise(rng: np.random.RandomState, kind: str, seconds: float = 30.0) -> np.ndarray:
    sr = 48_000
    n = int(sr * seconds)
    w = rng.randn(n)
    if kind == "white":
        out = w
    elif kind == "pink":  # -3 dB/oct via cascaded one-pole sections
        out = np.zeros(n)
        state = np.zeros(3)
        poles = (0.997, 0.985, 0.95)
        gains = (0.05, 0.15, 0.5)
        for p, g, i in zip(poles, gains, range(3)):
            # vectorized one-pole lowpass via lfilter-free recursion in
            # blocks (scipy-free): y[k] = p*y[k-1] + g*w[k]
            y = np.empty(n)
            acc = state[i]
            for s in range(0, n, 4800):
                blk = w[s : s + 4800]
                for j in range(len(blk)):  # small corpus: fine in numpy
                    acc = p * acc + g * blk[j]
                    y[s + j] = acc
            out += y
    elif kind == "band":  # band-passed rumble: difference of moving means
        k1, k2 = 48, 480
        c = np.cumsum(np.concatenate([[0.0], w]))
        m1 = (c[k1:] - c[:-k1]) / k1
        m2 = (c[k2:] - c[:-k2]) / k2
        out = m1[: n - k2] - m2[: n - k2]
        out = np.concatenate([out, np.zeros(n - len(out))])
    else:
        raise ValueError(kind)
    return out / (np.abs(out).max() + 1e-9) * 10_000


def snr_db(clean: np.ndarray, test: np.ndarray, max_shift: int = 960) -> float:
    """SNR of `test` against `clean`, searching alignment shifts."""
    best = -np.inf
    n = min(len(clean), len(test)) - max_shift
    c = clean[:n]
    ce = float(np.dot(c, c))
    for s in range(0, max_shift + 1, 480):
        d = c - test[s : s + n]
        err = float(np.dot(d, d))
        if err > 0:
            best = max(best, 10 * np.log10(ce / err))
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/nnt_train_demo")
    ap.add_argument("--count", type=int, default=150_000)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--window", type=int, default=500)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--export", default=None,
                    help="also write the quantized model here")
    args = ap.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.RandomState(args.seed)

    # ---- 1. corpus --------------------------------------------------------
    t0 = time.time()
    sig_paths, noise_paths = [], []
    for i in range(6):
        p = os.path.join(args.workdir, f"voice{i}.wav")
        write_wav(p, synth_voice(rng))
        sig_paths.append(p)
    for i, kind in enumerate(["white", "pink", "band", "white", "pink"]):
        p = os.path.join(args.workdir, f"noise{i}.wav")
        write_wav(p, synth_noise(rng, kind))
        noise_paths.append(p)
    print(f"corpus synthesized in {time.time()-t0:.1f}s")

    # ---- 2. training data (the C27 generator) -----------------------------
    from nnnoiseless_tpu.training.data import generate
    from nnnoiseless_tpu.constants import NB_BANDS, NB_FEATURES

    t0 = time.time()
    data = generate(
        sig_paths, noise_paths, args.count, seed=args.seed,
        progress=lambda n: print(f"  {n}/{args.count}\r", end="", flush=True),
    )
    print(f"\ngenerated {data.shape} in {time.time()-t0:.1f}s")

    n_seq = len(data) // args.window
    data = data[: n_seq * args.window]
    features = data[:, :NB_FEATURES].reshape(n_seq, args.window, NB_FEATURES)
    gains = data[:, NB_FEATURES : NB_FEATURES + NB_BANDS].reshape(
        n_seq, args.window, NB_BANDS
    )
    vad = data[:, NB_FEATURES + 2 * NB_BANDS :].reshape(n_seq, args.window, 1)

    # ---- 3. fit (the C28 topology/losses) ---------------------------------
    from nnnoiseless_tpu.training.train import fit

    history: list = []
    t0 = time.time()
    params = fit(
        features, gains, vad,
        epochs=args.epochs,
        batch_size=min(args.batch_size, n_seq),  # tiny corpora still step
        seed=args.seed,
        lr_schedule="cosine", log_every=20, history=history,
    )
    train_s = time.time() - t0
    print(f"trained {len(history)} steps in {train_s:.1f}s")

    # ---- 4. quantized export + reload (C29) -------------------------------
    from nnnoiseless_tpu.training.network import export_model

    model = export_model(params)
    blob = model.to_bytes()
    model_path = os.path.join(args.workdir, "synthetic_demo.rnn")
    with open(model_path, "wb") as f:
        f.write(blob)
    if args.export:
        with open(args.export, "wb") as f:
            f.write(blob)
    print(f"exported {len(blob)} bytes -> {model_path}")

    # ---- 5. evaluation on a held-out mix ----------------------------------
    from nnnoiseless_tpu import RnnModel, denoise_audio

    eval_rng = np.random.RandomState(12345)
    clean = synth_voice(eval_rng, seconds=8.0)
    noise = synth_noise(eval_rng, "pink", seconds=8.0)
    # mix at ~5 dB SNR
    alpha = np.sqrt(np.dot(clean, clean) / (np.dot(noise, noise) * 10 ** 0.5))
    noisy = clean + alpha * noise

    reloaded = RnnModel.from_bytes(blob)
    out_trained = denoise_audio(noisy, model=reloaded, drop_first_frame=False)
    out_default = denoise_audio(noisy, drop_first_frame=False)

    m = {
        "steps": len(history),
        "loss_first": history[0][1] if history else None,
        "loss_last": history[-1][1] if history else None,
        "train_seconds": round(train_s, 1),
        "snr_noisy_db": round(snr_db(clean, noisy), 2),
        "snr_trained_db": round(snr_db(clean, out_trained), 2),
        "snr_default_db": round(snr_db(clean, out_default), 2),
    }
    m["snr_gain_trained_db"] = round(m["snr_trained_db"] - m["snr_noisy_db"], 2)
    m["snr_gain_default_db"] = round(m["snr_default_db"] - m["snr_noisy_db"], 2)
    print(json.dumps(m, indent=2))
    with open(os.path.join(args.workdir, "metrics.json"), "w") as f:
        json.dump({"metrics": m, "loss_history": history}, f)
    return m


if __name__ == "__main__":
    main()
