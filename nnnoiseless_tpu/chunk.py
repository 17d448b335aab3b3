"""Chunk-level hoisted analysis: frame-local work as big batched ops.

The reference interleaves frame-local DSP (windowed FFT, band energies,
pitch-search correlations) with the truly sequential state updates in one
mutable per-frame pass (src/denoise.rs:95-116, src/features.rs:115-219).
On TPU the scan body's cost is dominated not by FLOPs but by per-iteration
HBM<->VMEM staging (docs/PERFORMANCE.md), so the TPU-native shape of the
algorithm splits it:

* :func:`precompute_chunk` (here): every frame-local product for ALL
  frames of a chunk — HP filtering, pitch downsample/whiten/search and
  the dense octave-removal tables (plus, for the non-fused scan path,
  lag-0 windowed spectra + band/log energies + cepstra; the fused kernel
  computes those in-VMEM itself, ``lag0=False``) — as a handful of large
  (B*T)-batched MXU contractions *before* the scan;
* :func:`pipeline.frame_step_hoisted` (or the fused Pallas kernel,
  ops/frame_kernel.py): a lean scan body consuming one per-frame slice of
  the precompute and performing only the carry-coupled remainder
  (octave-removal selection, pitch-lag transform, cepstral ring, RNN,
  synthesis).

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
    FREQ_SIZE,
    PITCH_BUF_SIZE,
    PITCH_FRAME_DS,
    PITCH_MAX_DS,
    PITCH_MAX_PERIOD,
    WINDOW_SIZE,
)
from .ops.bands import band_energies_flat, dct22
from .ops.biquad import biquad_filter_frames
from .ops.fft import dense_dft_bases, xcorr_dft
from .ops.pitch import (
    doubling_candidates,
    doubling_tables,
    pitch_search,
    whiten,
    window_energies,
)
from .pipeline import FramePre, log_spectrum
from .tables import BIQUAD_HP_A, BIQUAD_HP_B

_F32 = jnp.float32
_DS_WIN = PITCH_BUF_SIZE // 2  # 864: downsampled pitch-buffer length


def _frame_windows(full: jnp.ndarray, t_count: int, offset: int, length: int,
                   stride: int) -> jnp.ndarray:
    """Stack per-frame windows full[:, offset + t*stride :][... : length].

    TIME-MAJOR result: (B, L) -> (T, B, length) — the layout both the frame
    scan and the fused kernel consume directly.

    When ``offset`` is stride-aligned the stack is assembled from
    ceil(length/stride) BLOCK-shifted views of one (nb, B, stride) reshape
    instead of ``t_count`` per-frame slices: window t is blocks
    [o+t, o+t+k) plus the head of block o+t+k, and ``blocks[o+i : o+i+T]``
    for each i is a single slice of the transposed reshape.  Pure data
    movement either way (bit-exact); the block form replaces a T-way
    slice+stack (T copies through HBM) with k+1 slices and one concat —
    the same trick that made the 480-sample frame stack a transpose.
    """
    if offset % stride == 0:
        o, k = offset // stride, length // stride
        rem = length % stride
        nb = o + t_count + k  # enough blocks for every window incl. the tail
        b = full.shape[0]
        pad = nb * stride - full.shape[1]
        if pad > 0:
            # The pad may only cover the block-alignment tail BEYOND the
            # last window — an under-length signal must fail loudly (as the
            # slice+stack path below would), not get zero-filled tails.
            need = offset + (t_count - 1) * stride + length
            if need > full.shape[1]:
                raise ValueError(
                    f"signal too short for {t_count} windows: need {need} "
                    f"samples, have {full.shape[1]}"
                )
            full = jnp.pad(full, ((0, 0), (0, pad)))
        bl = jnp.swapaxes(full[:, : nb * stride].reshape(b, nb, stride), 0, 1)
        parts = [bl[o + i : o + i + t_count] for i in range(k)]
        if rem:
            parts.append(bl[o + k : o + k + t_count, :, :rem])
        return jnp.concatenate(parts, axis=-1)
    return jnp.stack(
        [full[:, offset + t * stride : offset + t * stride + length]
         for t in range(t_count)],
        axis=0,
    )


def precompute_chunk(
    input_mem: jnp.ndarray,  # (B, 1728) carried input history
    hp_mem: jnp.ndarray,  # (B, 2) biquad carry
    frames: jnp.ndarray,  # (B, T, 480) raw input frames
    lag0: bool = True,
) -> tuple[FramePre, jnp.ndarray]:
    """All frame-local analysis for a chunk.

    Returns (pre, hp_mem') with every FramePre field TIME-MAJOR (T, B, ...)
    — the layout the frame scan's xs and the fused kernel's streaming
    blocks both want (Mosaic requires the sequential axis to lead).

    ``lag0=False`` (the fused-kernel path): the lag-0 spectrum / band
    energy / cepstrum / silence products are computed *inside* the frame
    kernel from its VMEM-resident input history (ops/frame_kernel.py),
    so this phase skips them entirely — the corresponding FramePre fields
    come back as None.  This deletes the precompute's largest matmul and
    the (T, B, 962) HBM spectrum stream it used to hand the kernel.
    """
    b, t, _ = frames.shape
    filtered, hp_out = biquad_filter_frames(
        frames, hp_mem, tuple(BIQUAD_HP_A), tuple(BIQUAD_HP_B)
    )
    # The filtered signal with history: input_mem at frame t is
    # full[:, 480(t+1) : 480(t+1)+1728].
    full = jnp.concatenate([input_mem, filtered.reshape(b, t * FRAME_SIZE)], axis=1)
    # full[:, 1728 + t*480 : 1728 + (t+1)*480] IS filtered[:, t, :] — the
    # time-major frame stack is a pure transpose, not a T-way slice copy.
    filtered_tm = jnp.swapaxes(filtered, 0, 1)

    x = ex = silence = ceps = None
    if lag0:
        # ---- lag-0 spectra -> band energies -> log spectrum -> cepstra ----
        # Dense f32 MXU product (window + rfft + wnorm folded into the
        # basis, same bases as the fused frame kernel's pitch-lag
        # transform).  The 960-sample analysis window of frame t is exactly
        # [frame t-1 | frame t] of the filtered signal, so instead of
        # materializing a (T, B, 960) window stack (1.5 GB at production
        # batch) the basis is split in half and applied to the
        # already-stacked (T, B, 480) frames and their 1-frame-shifted view.
        fwd_basis = jnp.asarray(dense_dft_bases()[0])  # (960, 962)
        first_prev = input_mem[:, PITCH_BUF_SIZE - WINDOW_SIZE + FRAME_SIZE :]
        fprev = jnp.concatenate([first_prev[None], filtered_tm[:-1]], axis=0)
        # 3-pass bf16 (~2^-21 rel, ~0.03 i16 units on full-scale audio):
        # validated against the golden per-sample bar on TPU.
        prec = jax.lax.Precision.HIGH
        x = jnp.matmul(fprev, fwd_basis[:FRAME_SIZE], precision=prec) + jnp.matmul(
            filtered_tm, fwd_basis[FRAME_SIZE:], precision=prec
        )
        ex = band_energies_flat(x)  # (T, B, 22), no packed reshape
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
    # Reference semantics: each frame's buffer is downsampled with x[-1]=0
    # at ITS OWN start (pitch.rs:455-458); only element 0 differs from the
    # full-signal decimation — recompute it window-locally.
    starts = FRAME_SIZE * (jnp.arange(t, dtype=jnp.int32) + 1)
    even0 = full[:, starts].T  # (T, B) = w[0]
    odd0 = full[:, starts + 1].T  # (T, B) = w[1]
    w0_tm = (odd0 * _F32(0.5) + even0) * _F32(0.5)  # (T, B) lane-0 patches

    from . import flags

    if jax.default_backend() == "cpu" or not flags.PITCH_KERNEL:
        # Keep the (T, B) axes unmerged through this branch: a T-major
        # (t*b, 864) flatten cannot carry the batch sharding through a
        # merged axis, so on a dp mesh GSPMD re-materializes every window
        # with a hot-path all-gather (caught by
        # test_parallel.py::test_gspmd_scan_path_has_no_collectives).
        # Double-vmap batches the same MXU products at (T, B, ...) shapes.
        x_lp_raw = _frame_windows(
            ds, t, FRAME_SIZE // 2, _DS_WIN, FRAME_SIZE // 2
        )
        x_lp_raw = x_lp_raw.at[..., 0].set(w0_tm)
        vv = lambda f: jax.vmap(jax.vmap(f))
        x_lp = vv(whiten)(x_lp_raw)
        # The fine-search correlation dot(x_lp[384:], x_lp[i:i+480]) IS
        # the octave-removal correlation at more lags: compute it ONCE for
        # all frames via DFTs (grouped 1-D convs lower as shifted adds on
        # TPU) and share it between both consumers.
        corr_shared = xcorr_dft(x_lp[..., PITCH_MAX_DS:], x_lp, PITCH_MAX_DS + 1)
        # ONE 385-lag forward window-energy table serves both the
        # fine-stage normalizer (first 294 lags) and octave removal's
        # reversed energy walk (a lane flip) — the banded matrices are
        # column selections of each other, so sharing is bit-exact and
        # deletes two of the three big banded matmuls.
        energies = window_energies(x_lp, PITCH_FRAME_DS, PITCH_MAX_DS + 1)
        search = vv(pitch_search)(x_lp, corr_shared, energies)
        pitch_idx = PITCH_MAX_PERIOD - search
        corr_full, yy_lookup, xx = vv(doubling_tables)(
            x_lp, corr_shared, energies
        )
        cand = vv(doubling_candidates)(corr_full, yy_lookup, xx, pitch_idx)
    else:
        # the ENTIRE pitch stack — whiten, shared 385-lag correlation,
        # energy table, coarse/fine search and candidate tables — as ONE
        # parallel Pallas kernel; every intermediate stays in VMEM
        # (ops/pitch_kernel.py).  The STREAM variant keeps the sliding
        # 864-sample window in VMEM scratch over a sequential T grid, so
        # the (T, B, 864) window stack (3.5x-redundant HBM traffic) is
        # never materialized at all.  NNT_PITCH_KERNEL=0 (captured at
        # import, flags.py) falls back to the round-2 XLA chain above —
        # the operational escape hatch if Mosaic regresses on this kernel.
        from .ops.pitch_kernel import pitch_analysis_stream

        cand, _ = pitch_analysis_stream(ds, w0_tm, t)

    pre = FramePre(
        filtered=filtered_tm,
        x=x,
        ex=ex,
        silence=silence,
        ceps=ceps,
        cand=cand.reshape(t, b, -1),
    )
    return pre, hp_out
