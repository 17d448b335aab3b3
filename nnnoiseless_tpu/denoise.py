"""Public denoising API: per-stream stateful wrapper + batched scan engine.

Two levels:

* :class:`DenoiseState` mirrors the reference's low-level API
  (src/denoise.rs:37-116): one stream, one 480-sample frame per call,
  returns the VAD probability.  Convenient, host-driven.
* :func:`process_frames` / :class:`StreamBatch` is the TPU-native path:
  ``lax.scan`` over frames x ``vmap`` over streams, one compiled program per
  (model topology, batch, chunk length).  This is where the throughput is —
  the per-call API exists for parity and small jobs.

Audio convention: f32 samples in the i16 range [-32768, 32767], 48 kHz mono
per stream (the reference's convention, denoise.rs:85-94).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .constants import FRAME_SIZE
from .model import ModelMeta, RnnModel
from .pipeline import DenoiseCarry, frame_step, init_carry


@functools.partial(jax.jit, static_argnums=(1,))
def _frame_step_jit(params, meta: ModelMeta, carry: DenoiseCarry, frame):
    """Single frame for one stream, routed through the batched step.

    The scalar (unbatched) program is pathological for the TPU compiler
    (hundreds of seconds of compile time for the same math); a B=1 vmap
    keeps every op >= 2-D and compiles in seconds with identical results.
    """
    c1 = jax.tree_util.tree_map(lambda x: x[None], carry)
    c2, out, vad = jax.vmap(lambda ci, fi: frame_step(params, meta, ci, fi))(
        c1, frame[None]
    )
    return jax.tree_util.tree_map(lambda x: x[0], c2), out[0], vad[0]


@functools.partial(jax.jit, static_argnums=(1,))
def _process_chunk(params, meta: ModelMeta, carry: DenoiseCarry, frames):
    """Single stream: frames (T, 480) -> (carry', out (T, 480), vad (T,)).

    Routed through the batched scan at B=1 (see _frame_step_jit).
    """
    c1 = jax.tree_util.tree_map(lambda x: x[None], carry)
    c2, out, vad = _scan_batch(params, meta, c1, frames[None])
    return jax.tree_util.tree_map(lambda x: x[0], c2), out[0], vad[0]


@functools.partial(jax.jit, static_argnums=(3,))
def _precompute_jit(input_mem, hp_mem, frames, lag0: bool = True):
    from .chunk import precompute_chunk

    return precompute_chunk(input_mem, hp_mem, frames, lag0=lag0)


# Only the internally-produced precompute stream is donated; the
# caller-supplied carry is left intact (donating it would invalidate the
# user's buffers on TPU — callers may legitimately reuse a carry, e.g. to
# re-process from the same initial state).
@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(3,))
def _fused_jit(params, meta: ModelMeta, carry, pre):
    from .ops.frame_kernel import run_fused_scan

    return run_fused_scan(params, meta, carry, pre)


def two_phase_available(meta: ModelMeta, frames) -> bool:
    from . import flags
    from .ops.frame_kernel import fused_scan_available

    return (
        flags.FUSED
        and flags.TWO_PHASE
        and jax.default_backend() != "cpu"
        and frames.ndim == 3
        and fused_scan_available(meta, frames.shape[0])
    )


def _two_phase_chunk(params, meta: ModelMeta, carry, frames):
    """Production TPU path: TWO device programs per chunk.

    Compiling precompute and the fused frame kernel as one XLA program
    makes the whole chunk ~75% slower than the sum of its parts (measured
    at batch 4096: 1070 ms combined vs 312 + 298 ms separate — XLA's
    scheduling/rematerialization of the combined graph degrades both
    halves).  Dispatch is async, so the second program queues behind the
    first with no host round-trip between them.
    """
    pre, hp_out = _precompute_jit(
        carry.feat.input_mem, carry.feat.hp_mem, frames, False
    )
    carry2, out, vad = _fused_jit(params, meta, carry, pre)
    carry2 = carry2._replace(feat=carry2.feat._replace(hp_mem=hp_out))
    return carry2, out, vad


def _scan_batch(params, meta: ModelMeta, carry, frames):
    """frames (B, T, 480) -> (carry', out (B, T, 480), vad (B, T)).

    Two phases (the TPU-native shape of the algorithm, see chunk.py):

    1. everything frame-local — HP filtering, lag-0 spectra/energies/
       cepstra, pitch whitening/search and the octave-removal tables — is
       precomputed for ALL frames as large batched MXU ops;
    2. a lean ``lax.scan`` over frames runs only the carry-coupled
       remainder (pipeline.frame_step_hoisted).

    Only the final carry's hp_mem matters for chunk handoff and is patched
    in afterwards.
    """
    from . import flags
    from .chunk import precompute_chunk
    from .ops.frame_kernel import fused_scan_available, run_fused_scan
    from .pipeline import frame_step_hoisted

    batch = frames.shape[0]
    use_fused = (
        flags.FUSED
        and jax.default_backend() != "cpu"
        and fused_scan_available(meta, batch)
    )
    pre, hp_out = precompute_chunk(
        carry.feat.input_mem, carry.feat.hp_mem, frames, lag0=not use_fused
    )
    if use_fused:
        carry, out, vad = run_fused_scan(params, meta, carry, pre)
        carry = carry._replace(feat=carry.feat._replace(hp_mem=hp_out))
        return carry, out, vad

    def step(c, pre_t):  # pre_t: FramePre slices with leading (B,)
        c2, out, vad = jax.vmap(
            lambda ci, pi: frame_step_hoisted(params, meta, ci, pi)
        )(c, pre_t)
        return c2, (out, vad)

    carry, (out, vad) = jax.lax.scan(step, carry, pre)  # pre is time-major
    carry = carry._replace(feat=carry.feat._replace(hp_mem=hp_out))
    return carry, jnp.swapaxes(out, 0, 1), jnp.swapaxes(vad, 0, 1)


@functools.partial(jax.jit, static_argnums=(1,))
def _process_chunk_batch(params, meta: ModelMeta, carry, frames):
    """Batched: frames (B, T, 480) -> (carry', out (B, T, 480), vad (B, T)).

    The scan runs over the frame axis (the true sequential dependency); the
    stream axis is vmapped inside each step so every per-frame op sees the
    full batch and keeps the MXU/VPU busy.
    """
    return _scan_batch(params, meta, carry, frames)


def init_batch_carry(meta: ModelMeta, batch: int) -> DenoiseCarry:
    """A zeroed carry replicated over ``batch`` streams."""
    one = init_carry(meta)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one
    )


def process_frames(
    model: RnnModel, carry: DenoiseCarry, frames
) -> tuple[DenoiseCarry, jnp.ndarray, jnp.ndarray]:
    """Run frames through the denoiser.

    ``frames`` is (T, 480) for one stream or (B, T, 480) for a batch; the
    carry must have matching batch shape (see :func:`init_batch_carry`).
    """
    frames = jnp.asarray(frames, jnp.float32)
    if frames.ndim == 2:
        return _process_chunk(model.params, model.meta, carry, frames)
    if frames.ndim == 3:
        if two_phase_available(model.meta, frames):
            return _two_phase_chunk(model.params, model.meta, carry, frames)
        return _process_chunk_batch(model.params, model.meta, carry, frames)
    raise ValueError(f"frames must be (T,480) or (B,T,480), got {frames.shape}")


class DenoiseState:
    """Stateful single-stream denoiser, mirroring the reference API.

    >>> state = DenoiseState.new()
    >>> out, vad = state.process_frame(frame)   # frame: 480 f32 samples

    As with the reference, the first output frame contains fade-in artifacts
    and is usually discarded.

    ``engine`` selects the backend (the latency ladder, docs/PERFORMANCE.md):

    * ``"tpu"`` (default) — the batched JAX/XLA engine.  Every device
      dispatch carries a fixed ~27-45 ms cost through the tunnel, so
      per-frame calls run at ~26x realtime aggregate and CANNOT meet the
      reference's 10 ms live-stream deadline (src/denoise.rs:87-90); use
      :meth:`process_chunk` / :class:`StreamBatch` to amortize.
    * ``"native"`` — the in-process C++ engine (native/denoise_engine.cc):
      no device round-trip, ~62x realtime single-core, so
      :meth:`process_frame` returns in well under the 10 ms frame period —
      the real-time path for one live stream, exactly the reference's
      design point.
    """

    FRAME_SIZE = FRAME_SIZE

    def __init__(self, model: Optional[RnnModel] = None, engine: str = "tpu"):
        if engine not in ("tpu", "native"):
            raise ValueError(f"engine must be 'tpu' or 'native', got {engine!r}")
        self.engine = engine
        self.model = model if model is not None else RnnModel.default()
        if engine == "native":
            from .native import NativeDenoiseState, NativeModel

            # The native library ships the default weights; only a custom
            # model needs the (lossless) .rnn round-trip into the parser.
            self._nmodel = (
                NativeModel(self.model.to_bytes()) if model is not None else None
            )
            self._nstate = NativeDenoiseState(self._nmodel)
            self.carry = None
        else:
            self.carry = init_carry(self.model.meta)

    # Constructor aliases mirroring the reference's new/from_model/with_model
    # (ownership distinctions don't exist in Python; all three share the model).
    @classmethod
    def new(cls, engine: str = "tpu") -> "DenoiseState":
        return cls(engine=engine)

    @classmethod
    def from_model(cls, model: RnnModel, engine: str = "tpu") -> "DenoiseState":
        return cls(model, engine=engine)

    @classmethod
    def with_model(cls, model: RnnModel, engine: str = "tpu") -> "DenoiseState":
        return cls(model, engine=engine)

    def reset(self) -> None:
        if self.engine == "native":
            self._nstate.reset()
        else:
            self.carry = init_carry(self.model.meta)

    def process_frame(self, frame) -> tuple[np.ndarray, float]:
        """Denoise one 480-sample frame; returns (output, vad_probability)."""
        if self.engine == "native":
            return self._nstate.process_frame(frame)
        frame = jnp.asarray(frame, jnp.float32)
        if frame.shape != (FRAME_SIZE,):
            raise ValueError(f"expected frame of shape ({FRAME_SIZE},)")
        self.carry, out, vad = _frame_step_jit(
            self.model.params, self.model.meta, self.carry, frame
        )
        return np.asarray(out), float(vad)

    def process_chunk(self, frames) -> tuple[np.ndarray, np.ndarray]:
        """Denoise (T, 480) frames in one engine call; returns (out, vad)."""
        if self.engine == "native":
            frames = np.ascontiguousarray(frames, np.float32)
            if frames.ndim != 2 or frames.shape[1] != FRAME_SIZE:
                raise ValueError(f"expected frames of shape (T, {FRAME_SIZE})")
            return self._nstate.process_frames(frames)
        self.carry, out, vad = process_frames(self.model, self.carry, frames)
        return np.asarray(out), np.asarray(vad)


class StreamBatch:
    """A batch of independent denoiser streams (the TPU-native entry point).

    >>> batch = StreamBatch(batch=1024)
    >>> out, vad = batch.process(frames)        # frames: (1024, T, 480)
    """

    def __init__(self, batch: int, model: Optional[RnnModel] = None):
        self.model = model if model is not None else RnnModel.default()
        self.batch = batch
        self.carry = init_batch_carry(self.model.meta, batch)

    def reset(self) -> None:
        self.carry = init_batch_carry(self.model.meta, self.batch)

    def process(self, frames) -> tuple[np.ndarray, np.ndarray]:
        frames = jnp.asarray(frames, jnp.float32)
        if frames.ndim != 3 or frames.shape[0] != self.batch:
            raise ValueError(
                f"expected frames of shape ({self.batch}, T, {FRAME_SIZE})"
            )
        self.carry, out, vad = process_frames(self.model, self.carry, frames)
        return np.asarray(out), np.asarray(vad)


def denoise_audio(
    audio,
    model: Optional[RnnModel] = None,
    drop_first_frame: bool = True,
    chunk_frames: int = 1000,
) -> np.ndarray:
    """Convenience: denoise a full mono signal (n,) or batch (B, n).

    Truncates the tail to whole frames (the reference CLI's behavior) and
    (by default) drops the first output frame like the reference
    CLI/Signal adapters.  Returns the same leading shape with length
    trimmed to whole frames.

    Long signals are processed in ``chunk_frames``-frame chunks with exact
    carry handoff (chunking never changes the output — the engine state is
    the complete inter-frame dependency, test_chunked_equals_oneshot):
    peak device memory stays bounded (a 10-second window per stream
    instead of the whole file; the reference streams frame-by-frame,
    src/nnnoiseless.rs:307-330) and the last partial chunk reuses the
    1000-frame program's shape only when it matches, so at most two
    programs compile.
    """
    model = model if model is not None else RnnModel.default()
    audio = np.asarray(audio, np.float32)
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    b, n = audio.shape
    t = n // FRAME_SIZE
    frames = audio[:, : t * FRAME_SIZE].reshape(b, t, FRAME_SIZE)
    carry = init_batch_carry(model.meta, b)
    parts = []
    for start in range(0, t, chunk_frames):
        carry, out, _ = process_frames(
            model, carry, frames[:, start : start + chunk_frames]
        )
        parts.append(np.asarray(out))
    out = np.concatenate(parts, axis=1).reshape(b, t * FRAME_SIZE)
    if drop_first_frame:
        out = out[:, FRAME_SIZE:]
    return out[0] if squeeze else out
