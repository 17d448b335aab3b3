#!/usr/bin/env python
"""Usage tour of the nnnoiseless_tpu APIs (runs on CPU or TPU).

    python examples/denoise_stream.py [input.wav]

Covers: one-shot denoising, the stateful per-frame API, the batched
TPU-native engine, the streaming iterator adapter, and the native C++
engine (if a toolchain is available).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

import nnnoiseless_tpu as nt


def main() -> int:
    if len(sys.argv) > 1:
        from nnnoiseless_tpu.audio_io import read_wav, resample_to_48k

        samples, rate = read_wav(sys.argv[1])
        samples = resample_to_48k(samples, rate)[:, 0]
    else:  # 1 s of noisy tone
        rng = np.random.RandomState(0)
        t = np.arange(48_000) / 48_000.0
        samples = (np.sin(2 * np.pi * 440 * t) * 8000 + rng.randn(48_000) * 1500).astype(
            np.float32
        )

    # 1. one-shot (f32 samples in the i16 range)
    out = nt.denoise_audio(samples)
    print(f"denoise_audio: {len(samples)} samples in, {len(out)} out "
          f"(first frame dropped)")

    # 2. stateful, frame at a time — mirrors the reference DenoiseState
    state = nt.DenoiseState.new()
    frame = samples[: nt.FRAME_SIZE]
    denoised, vad = state.process_frame(frame)
    print(f"process_frame: vad={vad:.3f}")

    # 3. the TPU-native batched engine: streams are the batch axis
    n_frames = len(samples) // nt.FRAME_SIZE
    frames = samples[: n_frames * nt.FRAME_SIZE].reshape(1, n_frames, nt.FRAME_SIZE)
    batch = np.broadcast_to(frames, (8, n_frames, nt.FRAME_SIZE))
    engine = nt.StreamBatch(batch=8)
    outs, vads = engine.process(batch)
    print(f"StreamBatch: processed {outs.shape} with mean vad {vads.mean():.3f}")

    # 4. streaming iterator over [-1, 1] samples (dasp-Signal equivalent)
    first_1000 = []
    for s in nt.DenoiseSignal(iter(samples[: 3 * nt.FRAME_SIZE] / 32768.0)):
        first_1000.append(s)
        if len(first_1000) >= 1000:
            break
    print(f"DenoiseSignal: streamed {len(first_1000)} samples")

    # 5. the native C++ engine (same golden-oracle quality, no device)
    try:
        from nnnoiseless_tpu.native import NativeDenoiseState

        nst = NativeDenoiseState()
        _, nvad = nst.process_frame(frame)
        print(f"native engine: vad={nvad:.3f}")
    except Exception as e:  # no toolchain
        print(f"native engine unavailable: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
