"""nnnoiseless_tpu — a TPU-native real-time noise-suppression framework.

A from-scratch JAX/XLA/Pallas rebuild of the RNNoise-lineage noise
suppressor (capability reference: the `nnnoiseless` Rust crate): 48 kHz mono
streams, 10 ms frames, 22 Bark-band gains predicted by a tiny int8 GRU
network, pitch-comb filtering and overlap-add resynthesis.

Design: the whole per-frame pipeline is a pure function scanned over frames
and vmapped/sharded over thousands of independent streams; weights live in
VMEM; batch is the scaling axis (data-parallel over ICI for multi-chip).

Quick start::

    import nnnoiseless_tpu as nt
    out = nt.denoise_audio(samples)            # (n,) f32 in i16 range

    state = nt.DenoiseState.new()              # streaming, frame at a time
    out, vad = state.process_frame(frame480)

    batch = nt.StreamBatch(batch=1024)         # TPU-native batched engine
    out, vad = batch.process(frames)           # (1024, T, 480)
"""

from .constants import FRAME_SIZE, FREQ_SIZE, NB_BANDS, NB_FEATURES
from .denoise import (
    DenoiseState,
    StreamBatch,
    denoise_audio,
    init_batch_carry,
    process_frames,
)
from .model import ModelParseError, RnnModel, convert_rnnoise
from .signal import DenoiseSignal
from .pipeline import DenoiseCarry, frame_step, init_carry

__version__ = "0.1.0"

__all__ = [
    "FRAME_SIZE",
    "FREQ_SIZE",
    "NB_BANDS",
    "NB_FEATURES",
    "DenoiseState",
    "StreamBatch",
    "denoise_audio",
    "process_frames",
    "init_batch_carry",
    "RnnModel",
    "convert_rnnoise",
    "DenoiseSignal",
    "ModelParseError",
    "DenoiseCarry",
    "frame_step",
    "init_carry",
    "__version__",
]
