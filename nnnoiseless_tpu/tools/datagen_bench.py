"""Standing benchmark for the training-data generator.

Measures `training.data.generate` throughput (rows/s) with its host/device
timing split on a synthetic corpus, so datagen regressions show up as a
number instead of a slow training run.  The reference's generator is a
native binary dumping millions of rows (src/training.rs:120-161); this
records what a corpus-scale dump costs here and where the time goes.

Usage:
    python -m nnnoiseless_tpu.tools.datagen_bench [--rows N] [--workers W]
        [--chunk C] [--workdir DIR]

The corpus (18 synthetic voices, 12 synthetic noises, 30 s each) is built
once in --workdir and reused across runs.  Compile time is excluded by a
small warmup at the same (workers, chunk) shape.
"""

import argparse
import importlib.util
import os
import time

import numpy as np


def _load_synth():
    """examples/train_synthetic.py is a script, not a package module."""
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    spec = importlib.util.spec_from_file_location(
        "train_synthetic", os.path.join(root, "examples", "train_synthetic.py")
    )
    ts = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ts)
    return ts


def build_corpus(workdir: str):
    ts = _load_synth()
    os.makedirs(workdir, exist_ok=True)
    rng = np.random.RandomState(0)
    sig_paths, noise_paths = [], []
    for i in range(18):
        p = os.path.join(workdir, f"voice{i}.wav")
        if not os.path.exists(p):
            ts.write_wav(
                p, ts.synth_voice(rng) if i < 6 else ts.synth_voice_varied(rng)
            )
        sig_paths.append(p)
    kinds = ["white", "pink", "band", "white", "pink"]
    for i in range(12):
        p = os.path.join(workdir, f"noise{i}.wav")
        if not os.path.exists(p):
            ts.write_wav(
                p,
                ts.synth_noise(rng, kinds[i])
                if i < 5
                else ts.synth_noise_varied(rng),
            )
        noise_paths.append(p)
    return sig_paths, noise_paths


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--rows", type=int, default=120_000)
    ap.add_argument("--workers", type=int, default=96)
    ap.add_argument("--chunk", type=int, default=625)
    ap.add_argument("--workdir", default="/tmp/nnt_datagen_bench")
    args = ap.parse_args(argv)

    from ..training.data import generate

    sig, noise = build_corpus(args.workdir)
    print(f"corpus: {len(sig)} voices, {len(noise)} noises", flush=True)

    # warmup at the measured shape (first compile excluded from timing)
    generate(sig, noise, args.workers * args.chunk, seed=99,
             workers=args.workers, chunk=args.chunk)

    timing = {}
    t0 = time.perf_counter()
    data = generate(sig, noise, args.rows, seed=1, workers=args.workers,
                    chunk=args.chunk, timing=timing)
    wall = time.perf_counter() - t0
    assert data.shape == (args.rows, 87) and np.isfinite(data).all()
    print(
        f"{args.rows} rows, workers={args.workers} chunk={args.chunk}: "
        f"wall {wall:.1f}s  device {timing['device_s']:.1f}s  "
        f"host-sim {timing['host_s']:.1f}s  ({args.rows / wall:.0f} rows/s)"
    )


if __name__ == "__main__":
    main()
