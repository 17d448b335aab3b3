#!/usr/bin/env python
"""Throughput benchmark: batched 48 kHz denoising on one chip.

Measures 10 ms-frames/sec at several batch sizes and reports the aggregate
real-time factor (frames/sec ÷ 100; one real-time 48 kHz stream consumes 100
frames/sec).  The reference publishes no numbers (BASELINE.md); the
north-star target is >= 10,000x aggregate real-time per chip at batch 4096,
which is what ``vs_baseline`` is normalized against.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import numpy as np

NORTH_STAR = 10_000.0  # aggregate real-time factor target at batch 4096


def _wait_for_device(max_wait_s: float) -> bool:
    """Probe device availability in a subprocess with a timeout.

    When the axon TPU tunnel is down, ``jax.devices()`` hangs the calling
    process forever (observed 2026-08-17: multi-hour outage); a hung bench
    is worse than a failed one.  Probe in a throwaway subprocess (nothing
    is compiled, so the first-compile penalty does not apply) and retry
    until the deadline."""
    import os
    import subprocess

    deadline = time.time() + max_wait_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
                timeout=150,
                capture_output=True,
                env=dict(os.environ),
            )
            if r.returncode == 0 and r.stdout.strip().isdigit():
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print("# device probe failed; retrying", file=sys.stderr, flush=True)
        time.sleep(60)


def bench_batch(
    model, batch: int, n_frames: int, iters: int = 3, depth: int = 16
) -> tuple[float, float]:
    """Returns (steady_fps, sync_fps), aggregate frames/sec over the batch.

    ``sync`` is the round-4 methodology — one chunk per measurement with a
    host readback after each, so every chunk pays the ~30-40 ms tunnel
    dispatch round-trip.  ``steady`` is the production streaming shape:
    ``depth`` chunks dispatched back-to-back with the carry chained on
    device and ONE readback at the end — the round-trip amortizes away and
    the device runs saturated (the two engine phases already queue with no
    host gap, docs/PERFORMANCE.md round-5 attribution).  A caller feeding
    a continuous stream gets the steady number.
    """
    import jax.numpy as jnp

    from nnnoiseless_tpu import init_batch_carry
    from nnnoiseless_tpu.parallel.mesh import _sharded_chunk

    rng = np.random.RandomState(0)
    frames = jnp.asarray(
        (rng.randn(batch, n_frames, 480) * 3000).astype(np.float32)
    )
    carry0 = init_batch_carry(model.meta, batch)

    def force(out):
        # A host readback of a value derived from the full output is the
        # only reliable completion barrier on this backend:
        # jax.block_until_ready has been observed to return early for some
        # program shapes (0.8 ms "measured" for a 115 ms chunk at batch
        # 1024), silently inflating throughput ~100x.  The reduction reads
        # one lane of the final frame — negligible work, but it cannot
        # complete before the whole chunk has.
        return float(jnp.sum(out[:, -1, 0]))

    # warmup/compile
    carry, out, vad = _sharded_chunk(model.params, model.meta, carry0, frames)
    force(out)

    best_sync = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        carry, out, vad = _sharded_chunk(model.params, model.meta, carry, frames)
        force(out)
        best_sync = min(best_sync, time.perf_counter() - t0)

    best_steady = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(depth):
            carry, out, vad = _sharded_chunk(
                model.params, model.meta, carry, frames
            )
        force(out)
        best_steady = min(best_steady, (time.perf_counter() - t0) / depth)

    fps = batch * n_frames
    return fps / best_steady, fps / best_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--batches", type=int, nargs="*", default=[1, 64, 1024, 4096]
    )
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument(
        "--probe-wait", type=float,
        default=float(__import__("os").environ.get("NNT_BENCH_PROBE_S", 900)),
        help="max seconds to wait for the device backend to respond",
    )
    args = ap.parse_args()

    if not _wait_for_device(args.probe_wait):
        print(json.dumps({"metric": "aggregate_realtime_factor", "value": 0.0,
                          "unit": "x_realtime_48kHz_mono", "vs_baseline": 0.0,
                          "error": "device backend unreachable "
                                   f"(waited {args.probe_wait:.0f}s)"}))
        return

    from nnnoiseless_tpu import RnnModel

    model = RnnModel.default()
    dev = jax.devices()[0]
    results = {}
    # Largest batch first: it is the headline metric, and on this backend
    # the first compile costs minutes — make sure the number that matters
    # lands even if a later (cheaper) config fails or times out.
    for b in sorted(args.batches, reverse=True):
        try:
            steady, sync = bench_batch(model, b, args.frames, args.iters)
        except Exception as e:  # keep going; report what we have
            print(f"# batch {b}: FAILED ({e})", file=sys.stderr)
            continue
        results[b] = (steady, sync)
        print(
            f"# batch {b:5d}: {steady:12.0f} frames/s = {steady / 100:9.1f}x "
            f"realtime steady ({sync / 100:.1f}x per-chunk-sync)",
            file=sys.stderr,
            flush=True,
        )

    if not results:
        print(json.dumps({"metric": "aggregate_realtime_factor", "value": 0.0,
                          "unit": "x_realtime_48kHz_mono", "vs_baseline": 0.0,
                          "error": "all batch configs failed"}))
        return
    top_batch = max(results)
    rt = results[top_batch][0] / 100.0
    detail = {}
    for b, (steady, sync) in results.items():
        detail[f"batch{b}"] = round(steady / 100.0, 1)
        detail[f"batch{b}_sync"] = round(sync / 100.0, 1)
    print(
        json.dumps(
            {
                "metric": f"aggregate_realtime_factor_batch{top_batch}",
                "value": round(rt, 1),
                "unit": "x_realtime_48kHz_mono",
                "vs_baseline": round(rt / NORTH_STAR, 3),
                "detail": detail,
                "device": str(dev),
            }
        )
    )


if __name__ == "__main__":
    main()
