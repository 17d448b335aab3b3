"""Streaming signal adapter: denoise an iterator of audio frames.

Equivalent of the reference's dasp ``DenoiseSignal`` (src/signal.rs): wraps
any iterable of float samples in [-1, 1] (mono) or per-channel tuples,
rescales by 32768 into the denoiser's i16-range convention, runs one
denoiser state per channel (batched on device), discards the first output
frame (fade-in artifacts, signal.rs:83-87), and yields clamped [-1, 1]
samples with the same channel structure.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional, Sequence, Union

import numpy as np

from .constants import FRAME_SIZE
from .denoise import StreamBatch
from .model import RnnModel

Sample = Union[float, Sequence[float]]


class DenoiseSignal:
    """Iterator adapter: ``for sample in DenoiseSignal(samples): ...``"""

    def __init__(
        self,
        source: Iterable[Sample],
        model: Optional[RnnModel] = None,
        channels: Optional[int] = None,
    ):
        self._source = iter(source)
        self._first = next(self._source, None)
        if self._first is None:
            self._channels = channels or 1
        elif isinstance(self._first, (int, float, np.floating, np.integer)):
            self._channels = 1
        else:
            self._channels = len(self._first)
        if channels is not None and channels != self._channels:
            raise ValueError("explicit channels disagrees with source frames")
        self._batch = StreamBatch(self._channels, model)
        self._scalar = self._channels == 1 and (
            self._first is None
            or isinstance(self._first, (int, float, np.floating, np.integer))
        )
        self._exhausted = False
        self._dropped_first = False

    # -- constructor aliases mirroring the reference -----------------------
    @classmethod
    def new(cls, source) -> "DenoiseSignal":
        return cls(source)

    @classmethod
    def with_model(cls, source, model: RnnModel) -> "DenoiseSignal":
        return cls(source, model)

    from_model = with_model

    def _next_input_frame(self) -> Optional[np.ndarray]:
        """Pull FRAME_SIZE samples -> (channels, 480) in i16 range, or None."""
        buf = np.zeros((self._channels, FRAME_SIZE), np.float32)
        for i in range(FRAME_SIZE):
            if self._first is not None:
                s = self._first
                self._first = None
            else:
                s = next(self._source, None)
            if s is None:
                if i == 0:
                    return None
                break  # zero-pad the tail
            if self._scalar:
                buf[0, i] = float(s) * 32768.0
            else:
                buf[:, i] = np.asarray(s, np.float32) * 32768.0
        return buf

    def __iter__(self) -> Iterator[Sample]:
        while True:
            frame = self._next_input_frame()
            if frame is None:
                return
            out, _vad = self._batch.process(frame[:, None, :])  # (C, 1, 480)
            if not self._dropped_first:
                self._dropped_first = True
                continue
            out = np.clip(out[:, 0, :] / 32768.0, -1.0, 1.0)
            for i in range(FRAME_SIZE):
                yield float(out[0, i]) if self._scalar else tuple(out[:, i])
