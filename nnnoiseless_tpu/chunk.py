"""Chunk-level hoisted analysis: frame-local work as big batched ops.

The reference interleaves frame-local DSP (windowed FFT, band energies,
pitch-search correlations) with the truly sequential state updates in one
mutable per-frame pass (src/denoise.rs:95-116, src/features.rs:115-219).
On TPU the scan body's cost is dominated not by FLOPs but by per-iteration
HBM<->VMEM staging (docs/PERFORMANCE.md), so the TPU-native shape of the
algorithm splits it:

* :func:`precompute_chunk` (here): every frame-local product for ALL
  frames of a chunk — HP filtering, lag-0 windowed spectra + band/log
  energies + cepstra, pitch downsample/whiten/search and the dense
  octave-removal tables — as a handful of large (B*T)-batched MXU
  contractions *before* the scan;
* :func:`pipeline.frame_step_hoisted`: a lean scan body consuming one
  per-frame slice of the precompute and performing only the carry-coupled
  remainder (octave-removal selection, pitch-lag transform, cepstral
  ring, RNN, synthesis).

The split is exact: each hoisted quantity is a pure function of the
HP-filtered input signal, which the chunk-level biquad provides up front
(ops/biquad.biquad_filter_frames — the HP filter is linear/time-invariant).
Per-frame semantics (including the reference's zero boundary at the start
of each 1728-sample pitch buffer, pitch.rs:455-458) are reproduced
window-locally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .constants import (
    FRAME_SIZE,
    PITCH_BUF_SIZE,
    PITCH_MAX_PERIOD,
    WINDOW_SIZE,
)
from .ops.bands import band_energies, dct22
from .ops.biquad import biquad_filter_frames
from .ops.fft import forward_transform
from .ops.pitch import doubling_tables, pitch_search, whiten
from .pipeline import FramePre, log_spectrum
from .tables import BIQUAD_HP_A, BIQUAD_HP_B

_F32 = jnp.float32
_DS_WIN = PITCH_BUF_SIZE // 2  # 864: downsampled pitch-buffer length


def _frame_windows(full: jnp.ndarray, t_count: int, offset: int, length: int,
                   stride: int) -> jnp.ndarray:
    """Stack per-frame windows full[:, offset + t*stride :][... : length].

    Static slices + one stack: (B, L) -> (B, T, length).  Chunk-level, so
    the copy cost is amortized over the whole scan.
    """
    return jnp.stack(
        [full[:, offset + t * stride : offset + t * stride + length]
         for t in range(t_count)],
        axis=1,
    )


def precompute_chunk(
    input_mem: jnp.ndarray,  # (B, 1728) carried input history
    hp_mem: jnp.ndarray,  # (B, 2) biquad carry
    frames: jnp.ndarray,  # (B, T, 480) raw input frames
) -> tuple[FramePre, jnp.ndarray]:
    """All frame-local analysis for a chunk. Returns (pre (B,T,...), hp_mem')."""
    b, t, _ = frames.shape
    filtered, hp_out = biquad_filter_frames(
        frames, hp_mem, tuple(BIQUAD_HP_A), tuple(BIQUAD_HP_B)
    )
    # The filtered signal with history: input_mem at frame t is
    # full[:, 480(t+1) : 480(t+1)+1728].
    full = jnp.concatenate([input_mem, filtered.reshape(b, t * FRAME_SIZE)], axis=1)

    # ---- lag-0 spectra -> band energies -> log spectrum -> cepstra --------
    off0 = FRAME_SIZE + (PITCH_BUF_SIZE - WINDOW_SIZE)  # window end = mem end
    win0 = _frame_windows(full, t, off0, WINDOW_SIZE, FRAME_SIZE)  # (B,T,960)
    x = forward_transform(win0)  # (B, T, 2, 481)
    ex = band_energies(x)  # (B, T, 22)
    ly, e = log_spectrum(ex)
    silence = e < _F32(0.04)
    ceps = dct22(ly)
    ceps = ceps.at[..., 0].add(_F32(-12.0)).at[..., 1].add(_F32(-4.0))

    # ---- pitch: per-frame downsampled + whitened buffers -------------------
    # 2x decimation of the whole signal once, then per-frame 864 windows.
    even = full[:, 0::2]
    odd = full[:, 1::2]
    prev_odd = jnp.concatenate([jnp.zeros((b, 1), _F32), odd[:, :-1]], axis=1)
    ds = ((prev_odd + odd) * _F32(0.5) + even) * _F32(0.5)  # (B, L/2)
    x_lp_raw = _frame_windows(ds, t, FRAME_SIZE // 2, _DS_WIN, FRAME_SIZE // 2)
    # Reference semantics: each frame's buffer is downsampled with x[-1]=0
    # at ITS OWN start (pitch.rs:455-458); only element 0 differs from the
    # full-signal decimation — recompute it window-locally.
    starts = FRAME_SIZE * (jnp.arange(t, dtype=jnp.int32) + 1)
    even0 = full[:, starts]  # (B, T) = w[0]
    odd0 = full[:, starts + 1]  # (B, T) = w[1]
    x_lp_raw = x_lp_raw.at[..., 0].set((odd0 * _F32(0.5) + even0) * _F32(0.5))

    flat = x_lp_raw.reshape(b * t, _DS_WIN)
    x_lp = jax.vmap(whiten)(flat)
    search = jax.vmap(pitch_search)(x_lp)
    pitch_idx = (PITCH_MAX_PERIOD - search).reshape(b, t)
    corr_full, yy_lookup, xx = jax.vmap(doubling_tables)(x_lp)

    pre = FramePre(
        filtered=filtered,
        x=x,
        ex=ex,
        silence=silence,
        ceps=ceps,
        pitch_idx=pitch_idx,
        corr_full=corr_full.reshape(b, t, -1),
        yy_lookup=yy_lookup.reshape(b, t, -1),
        xx=xx.reshape(b, t),
    )
    return pre, hp_out
