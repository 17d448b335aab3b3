"""Diagnostic traces of intermediate pipeline decisions.

Used by the lag-exact pitch cross-check (tests/test_pitch_trace.py): the
reference's pitch selection is sequential f32 arithmetic with data-dependent
argmax decisions (src/pitch.rs:372-405), and a ±1 lag flip audibly changes
output, so the JAX engine's pitch decisions are compared per-frame against
the independently implemented native C++ engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FRAME_SIZE, PITCH_BUF_SIZE
from ..ops.pitch import remove_doubling_from_candidates


@functools.partial(jax.jit, static_argnums=())
def _pitch_trace_jit(frames: jnp.ndarray):
    """frames (B, T, 480) raw input -> (periods (B, T) i32, gains (B, T))."""
    from ..chunk import precompute_chunk

    b = frames.shape[0]
    input_mem = jnp.zeros((b, PITCH_BUF_SIZE), jnp.float32)
    hp_mem = jnp.zeros((b, 2), jnp.float32)
    pre, _ = precompute_chunk(input_mem, hp_mem, frames)

    def step(carry, pre_t):
        last_period, last_gain = carry
        period, gain = jax.vmap(remove_doubling_from_candidates)(
            pre_t.cand, last_period, last_gain
        )
        return (period, gain), (period, gain)

    init = (jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.float32))
    _, (periods, gains) = jax.lax.scan(step, init, pre)  # pre is time-major
    return jnp.swapaxes(periods, 0, 1), jnp.swapaxes(gains, 0, 1)


def pitch_trace(signal: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-frame (period, gain) of the PRODUCTION pitch path (the same
    precompute_chunk + remove_doubling_from_candidates ops the scan engine
    runs), from a fresh state.

    ``signal`` is mono f32 in the i16 range; trailing samples beyond a
    whole frame are dropped.  Returns (periods (T,) int, gains (T,)).
    """
    signal = np.asarray(signal, np.float32)
    t = len(signal) // FRAME_SIZE
    frames = jnp.asarray(signal[: t * FRAME_SIZE].reshape(1, t, FRAME_SIZE))
    periods, gains = _pitch_trace_jit(frames)
    return np.asarray(periods[0]), np.asarray(gains[0])


def pitch_trace_native(signal: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-frame (period, gain) from the native C++ engine (nnt_get_pitch)."""
    from ..native import NativeDenoiseState

    signal = np.asarray(signal, np.float32)
    t = len(signal) // FRAME_SIZE
    st = NativeDenoiseState()
    periods = np.empty(t, np.int64)
    gains = np.empty(t, np.float64)
    out = np.empty(FRAME_SIZE, np.float32)
    for i in range(t):
        st.process_frame(signal[i * FRAME_SIZE : (i + 1) * FRAME_SIZE])
        periods[i], gains[i] = st.last_pitch()
    del out
    return periods, gains
