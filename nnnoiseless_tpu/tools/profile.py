"""Profiling / tracing harness for the denoise engine.

The reference has no in-tree profiling (SURVEY.md §5); its only perf harness
is a criterion micro-benchmark over 1 s of a 440 Hz sine (benches/sin.rs).
This module provides the TPU-native equivalents:

* ``sine_bench()`` — the same workload as benches/sin.rs (fresh state, 100
  frames of 440 Hz sine), timed per-frame and end-to-end, plus batched
  variants that show the TPU scaling curve;
* ``trace()`` — wraps a run in ``jax.profiler`` and writes a TensorBoard-
  loadable trace directory for per-kernel timing.

Usage::

    python -m nnnoiseless_tpu.tools.profile                 # sine bench
    python -m nnnoiseless_tpu.tools.profile --batch 1024
    python -m nnnoiseless_tpu.tools.profile --trace /tmp/tb  # + trace dir
"""

from __future__ import annotations

import argparse
import contextlib
import time

import numpy as np


def sine_signal(seconds: float = 1.0, freq: float = 440.0) -> np.ndarray:
    """48 kHz mono sine in the i16 range, like benches/sin.rs:9-14."""
    n = int(48_000 * seconds)
    t = np.arange(n, dtype=np.float64) / 48_000.0
    return (np.sin(2 * np.pi * freq * t) * 16_000).astype(np.float32)


@contextlib.contextmanager
def maybe_trace(trace_dir):
    import jax

    if trace_dir:
        with jax.profiler.trace(str(trace_dir)):
            yield
    else:
        yield


def sine_bench(batch: int = 1, seconds: float = 1.0, trace_dir=None) -> dict:
    """Run the sine workload; returns timing stats (compile excluded)."""
    import jax

    from ..denoise import StreamBatch
    from ..constants import FRAME_SIZE

    sig = sine_signal(seconds)
    t = len(sig) // FRAME_SIZE
    frames = np.broadcast_to(
        sig[: t * FRAME_SIZE].reshape(1, t, FRAME_SIZE), (batch, t, FRAME_SIZE)
    ).copy()

    sb = StreamBatch(batch)
    sb.process(frames)  # compile + warm up
    sb.reset()

    with maybe_trace(trace_dir):
        t0 = time.perf_counter()
        out, vad = sb.process(frames)
        jax.block_until_ready(sb.carry)
        dt = time.perf_counter() - t0

    frames_total = batch * t
    return {
        "batch": batch,
        "frames": t,
        "seconds_audio": frames_total / 100.0,
        "wall_s": dt,
        "frames_per_sec": frames_total / dt,
        "realtime_factor": frames_total / dt / 100.0,
        "us_per_frame": dt / frames_total * 1e6,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--trace", default=None, help="write a jax.profiler trace here")
    args = ap.parse_args(argv)
    stats = sine_bench(args.batch, args.seconds, args.trace)
    for k, v in stats.items():
        print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
