"""The fused per-frame denoise step: a pure function over a carry pytree.

This is the TPU-native core.  The reference's mutable frame-at-a-time driver
(src/denoise.rs:95-116 + src/features.rs) becomes

    frame_step(params, meta, carry, frame[480]) -> (carry', out[480], vad)

with every recurrent buffer — input history, cepstral ring, HP-filter and
overlap-add memories, GRU states, gain hangover, pitch continuity — held in
one ``DenoiseCarry``.  Scale comes from ``vmap`` over streams and
``lax.scan`` over frames (see denoise.py); nothing here has a batch axis.

The feature-analysis half (:class:`FeatureState`, :func:`analyze_frame`) is
exposed separately because the training-data generator (reference
src/training.rs:113-134) runs three analysis pipelines — clean, noise,
combined — without the denoising tail.

Silence-gate semantics (features.rs:160-166 + denoise.rs:101-112): when the
total band energy is below 0.04, the reference early-returns before touching
the cepstral ring or running the RNN.  Here both branches are computed and
every state update is masked, so a silent frame leaves the cepstral register,
the GRU states and lastg untouched and synthesizes the *unfiltered* spectrum.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .constants import (
    CEPS_MEM,
    FRAME_SIZE,
    NB_BANDS,
    NB_DELTA_CEPS,
    NB_FEATURES,
    PITCH_BUF_SIZE,
    WINDOW_SIZE,
)
from .model import ModelMeta
from .ops.bands import band_corr, band_energies, dct22, interp_band_gain
from .ops.biquad import biquad_filter_dense
from .ops.fft import forward_transform, inverse_transform
from .ops.pitch import pitch_process
from .ops.window import window_at_lag
from .ops.rnn import RnnState, init_rnn_state, rnn_step
from .tables import BIQUAD_HP_A, BIQUAD_HP_B

_F32 = jnp.float32


class FeatureState(NamedTuple):
    """Recurrent state of the analysis half (one stream).

    The reference keeps the cepstral history as a ring buffer plus an index
    (features.rs:23-26); here it is a shift register with the newest frame
    at row 0 — same contents, but updates are uniform tensor ops (concat +
    select) instead of scattered writes at a data-dependent index, which
    are gather/scatter-bound on TPU.
    """

    input_mem: jnp.ndarray  # (1728,) rolling input history (HP-filtered)
    hp_mem: jnp.ndarray  # (2,) biquad high-pass state
    cepstral_mem: jnp.ndarray  # (8, 22) cepstrum shift register, newest first
    pitch_period: jnp.ndarray  # () int32
    pitch_gain: jnp.ndarray  # () f32


class Analysis(NamedTuple):
    """Per-frame analysis products consumed by the denoising tail / trainer."""

    features: jnp.ndarray  # (42,) the NN input (zeroed when silent)
    x: jnp.ndarray  # (2, 481) packed spectrum of the frame (re, im)
    p: jnp.ndarray  # (2, 481) packed spectrum at the pitch lag
    ex: jnp.ndarray  # (22,) band energies of x
    ep: jnp.ndarray  # (22,) band energies of p
    exp: jnp.ndarray  # (22,) normalized band correlation x<->p
    silence: jnp.ndarray  # () bool
    period: jnp.ndarray  # () int32 pitch period


class DenoiseCarry(NamedTuple):
    """All recurrent state for one stream (~9.6 KB as f32)."""

    feat: FeatureState
    synthesis_mem: jnp.ndarray  # (480,) overlap-add tail
    rnn: RnnState  # GRU hidden states
    lastg: jnp.ndarray  # (22,) previous gains (hangover)


def init_feature_state() -> FeatureState:
    return FeatureState(
        input_mem=jnp.zeros((PITCH_BUF_SIZE,), _F32),
        hp_mem=jnp.zeros((2,), _F32),
        cepstral_mem=jnp.zeros((CEPS_MEM, NB_BANDS), _F32),
        pitch_period=jnp.int32(0),
        pitch_gain=_F32(0.0),
    )


def init_carry(meta: ModelMeta) -> DenoiseCarry:
    return DenoiseCarry(
        feat=init_feature_state(),
        synthesis_mem=jnp.zeros((FRAME_SIZE,), _F32),
        rnn=init_rnn_state(meta),
        lastg=jnp.zeros((NB_BANDS,), _F32),
    )


def log_spectrum(ex: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Floored/followed log band energies (features.rs:147-158).

    ``ex`` is (..., 22); returns (ly (..., 22), total_energy (...,)).  The
    floor chain is sequential over the 22 bands; unrolled statically and
    broadcast over any leading axes (the chunk path runs it once for all
    (B, T) frames, see chunk.py).
    """
    # one vectorized log10, then the 22-step floor/follow chain on
    # band-major slices (contiguous rows, not lane-strided extracts)
    raw = jnp.moveaxis(jnp.log10(_F32(1e-2) + ex), -1, 0)  # (22, ...)
    log_max = _F32(-2.0)
    follow = _F32(-2.0)
    ly = []
    for i in range(NB_BANDS):
        v = jnp.maximum(
            jnp.maximum(raw[i], log_max - _F32(7.0)), follow - _F32(1.5)
        )
        log_max = jnp.maximum(log_max, v)
        follow = jnp.maximum(follow - _F32(1.5), v)
        ly.append(v)
    return jnp.moveaxis(jnp.stack(ly, axis=0), 0, -1), jnp.sum(ex, axis=-1)


_log_spectrum = log_spectrum  # back-compat alias


def _spectral_variability(cepstral_mem: jnp.ndarray) -> jnp.ndarray:
    """Sum over rows of the min pairwise squared distance (features.rs:196-216)."""
    diff = cepstral_mem[:, None, :] - cepstral_mem[None, :, :]
    dist = jnp.sum(diff * diff, axis=-1)  # (8, 8)
    dist = dist + jnp.eye(CEPS_MEM, dtype=_F32) * _F32(1e15)  # exclude j == i
    min_dist = jnp.min(dist, axis=1)
    return jnp.sum(min_dist) / _F32(CEPS_MEM) - _F32(2.1)


def analyze_frame(
    state: FeatureState, frame: jnp.ndarray
) -> tuple[FeatureState, Analysis]:
    """Input shift + HP filter + full 42-dim feature analysis of one frame.

    Equivalent to shift_and_filter_input + compute_frame_features
    (features.rs:97-219).  Cepstral-ring updates are masked out on silent
    frames; input/pitch state updates are unconditional, as in the reference.
    """
    # Dense (matmul) formulation of the 480-step biquad recurrence; the
    # batched chunk path hoists this out of the scan entirely (see
    # analyze_frame_prefiltered / ops.biquad.biquad_filter_frames).
    filtered, hp_mem = biquad_filter_dense(
        frame, state.hp_mem, tuple(BIQUAD_HP_A), tuple(BIQUAD_HP_B)
    )
    return analyze_frame_prefiltered(state, filtered, hp_mem)


def analyze_frame_prefiltered(
    state: FeatureState, filtered: jnp.ndarray, hp_mem: jnp.ndarray
) -> tuple[FeatureState, Analysis]:
    """Analysis of an already HP-filtered frame; ``hp_mem`` is stored as-is."""
    # --- input shift (features.rs:97-104) ---------------------------------
    input_mem = jnp.concatenate([state.input_mem[FRAME_SIZE:], filtered])

    # --- pitch analysis (state updates are unconditional, pitch.rs:45-54) --
    period, pgain = pitch_process(input_mem, state.pitch_period, state.pitch_gain)

    # --- analysis at lag 0 and at the pitch lag, batched into one DFT ------
    frames2 = jnp.stack(
        [input_mem[PITCH_BUF_SIZE - WINDOW_SIZE :], window_at_lag(input_mem, period)]
    )
    spec2 = forward_transform(frames2)  # (2, 2, 481)
    e2 = band_energies(spec2)
    x, p = spec2[0], spec2[1]
    ex, ep = e2[0], e2[1]

    # --- log band energies + silence gate -----------------------------------
    ly, e = log_spectrum(ex)
    silence = e < _F32(0.04)

    # --- cepstrum (features.rs:167-169) --------------------------------------
    ceps = dct22(ly)
    ceps = ceps.at[0].add(_F32(-12.0)).at[1].add(_F32(-4.0))

    return _finish_analysis(
        state, input_mem, hp_mem, x, p, ex, ep, silence, ceps, period, pgain
    )


def _finish_analysis(
    state: FeatureState,
    input_mem: jnp.ndarray,
    hp_mem: jnp.ndarray,
    x: jnp.ndarray,
    p: jnp.ndarray,
    ex: jnp.ndarray,
    ep: jnp.ndarray,
    silence: jnp.ndarray,
    ceps: jnp.ndarray,
    period: jnp.ndarray,
    pgain: jnp.ndarray,
) -> tuple[FeatureState, Analysis]:
    """Shared analysis tail: pitch-correlation features, cepstral shift
    register + deltas + variability, feature assembly, silence masking.

    Used by both the per-frame path (analyze_frame_prefiltered) and the
    chunk-hoisted path (frame_step_hoisted), so the two compile to the
    same math.
    """
    exp_raw = band_corr(x, p)
    exp = exp_raw / jnp.sqrt(_F32(0.001) + ex * ep)

    # --- pitch-correlation cepstral features (features.rs:139-146) ---------
    tmp = dct22(exp)
    f_pitch = tmp[:NB_DELTA_CEPS]
    f_pitch = f_pitch.at[0].add(_F32(-1.3)).at[1].add(_F32(-0.9))
    f_period = _F32(0.01) * (period.astype(_F32) - _F32(300.0))

    # --- cepstral shift register + deltas (features.rs:170-194) -------------
    new_ceps_mem = jnp.concatenate(
        [ceps[None, :], state.cepstral_mem[:-1]], axis=0
    )
    c0 = ceps
    c1 = new_ceps_mem[1]  # previous frame
    c2 = new_ceps_mem[2]  # two frames back
    d = NB_DELTA_CEPS
    f_sum = c0[:d] + c1[:d] + c2[:d]
    f_d1 = c0[:d] - c2[:d]
    f_d2 = c0[:d] - _F32(2.0) * c1[:d] + c2[:d]

    f_spec = _spectral_variability(new_ceps_mem)

    features = jnp.concatenate(
        [
            f_sum,  # [0..6)   sums of last three cepstra
            ceps[d:NB_BANDS],  # [6..22)  cepstrum tail
            f_d1,  # [22..28) first delta
            f_d2,  # [28..34) second delta
            f_pitch,  # [34..40) pitch-correlation DCT
            f_period[None],  # [40]
            f_spec[None],  # [41]
        ]
    )
    assert features.shape == (NB_FEATURES,)
    features = jnp.where(silence, jnp.zeros((NB_FEATURES,), _F32), features)

    new_state = FeatureState(
        input_mem=input_mem,
        hp_mem=hp_mem,
        cepstral_mem=jnp.where(silence, state.cepstral_mem, new_ceps_mem),
        pitch_period=period,
        pitch_gain=pgain,
    )
    return new_state, Analysis(features, x, p, ex, ep, exp, silence, period)


def _pitch_filter(x, p, ex, ep, exp, gains):
    """Pitch comb filter + renormalization (features.rs:223-257)."""
    g_sq = gains * gains
    exp_sq = exp * exp
    r = jnp.where(
        exp > gains,
        _F32(1.0),
        exp_sq * (_F32(1.0) - g_sq) / (_F32(0.001) + g_sq * (_F32(1.0) - exp_sq)),
    )
    r = jnp.sqrt(jnp.clip(r, _F32(0.0), _F32(1.0)))
    r = r * jnp.sqrt(ex / (_F32(1e-8) + ep))
    rf = interp_band_gain(r)  # (481,)
    x1 = x + p * rf[None, :]

    new_e = band_energies(x1)
    norm = jnp.sqrt(ex / (_F32(1e-8) + new_e))
    normf = interp_band_gain(norm)
    return x1 * normf[None, :]


def frame_step(
    params: dict, meta: ModelMeta, carry: DenoiseCarry, frame: jnp.ndarray
) -> tuple[DenoiseCarry, jnp.ndarray, jnp.ndarray]:
    """Process one 480-sample frame for one stream.

    Returns (carry', denoised_frame (480,), vad_prob ()).
    Input/output are f32 in i16 range ([-32768, 32767]), like the reference.
    """
    feat_state, an = analyze_frame(carry.feat, frame)
    return _denoise_tail(params, meta, carry, feat_state, an)


def frame_step_prefiltered(
    params: dict,
    meta: ModelMeta,
    carry: DenoiseCarry,
    filtered: jnp.ndarray,
    hp_mem: jnp.ndarray,
) -> tuple[DenoiseCarry, jnp.ndarray, jnp.ndarray]:
    """frame_step for an already HP-filtered frame (see biquad_filter_frames:
    the batched chunk path hoists the filter out of the scan)."""
    feat_state, an = analyze_frame_prefiltered(carry.feat, filtered, hp_mem)
    return _denoise_tail(params, meta, carry, feat_state, an)


class FramePre(NamedTuple):
    """Frame-local analysis products, hoisted out of the scan (chunk.py).

    In the production chunk every field is TIME-MAJOR with leading (T, B)
    axes (the layout both the scan's xs and the fused Pallas kernel's
    streaming blocks consume); inside the scan body (``frame_step_hoisted``
    under ``vmap``) they are per-stream per-frame slices with the shapes
    noted here.
    """

    filtered: jnp.ndarray  # (480,) HP-filtered frame
    x: jnp.ndarray  # (962,) packed lag-0 spectrum [re(481) | im(481)]
    ex: jnp.ndarray  # (22,) band energies of x
    silence: jnp.ndarray  # () bool, total energy < 0.04
    ceps: jnp.ndarray  # (22,) cepstrum (DCT of ly, offsets applied)
    cand: jnp.ndarray  # (105,) octave-removal candidate tables
    #                    (ops/pitch.py::doubling_candidates layout)


def analyze_frame_hoisted(
    state: FeatureState, pre: FramePre
) -> tuple[FeatureState, Analysis]:
    """The analysis half of the lean scan body: only the carry-dependent
    remainder — octave-removal selection (continuity bonus from the
    previous frame), the analysis transform at the chosen pitch lag, the
    cepstral shift register.  ``hp_mem`` is unused here (the chunk filter
    owns it); the caller patches the final value.  Used by the denoise
    scan (frame_step_hoisted) and by the training-data generator's batched
    feature dump (training/data.py)."""
    from .ops.pitch import remove_doubling_from_candidates

    input_mem = jnp.concatenate([state.input_mem[FRAME_SIZE:], pre.filtered])
    period, pgain = remove_doubling_from_candidates(
        pre.cand, state.pitch_period, state.pitch_gain
    )
    p = forward_transform(window_at_lag(input_mem, period))  # (2, 481)
    ep = band_energies(p)
    x = pre.x.reshape(pre.x.shape[:-1] + (2, pre.x.shape[-1] // 2))
    return _finish_analysis(
        state,
        input_mem,
        state.hp_mem,
        x,
        p,
        pre.ex,
        ep,
        pre.silence,
        pre.ceps,
        period,
        pgain,
    )


def frame_step_hoisted(
    params: dict, meta: ModelMeta, carry: DenoiseCarry, pre: FramePre
) -> tuple[DenoiseCarry, jnp.ndarray, jnp.ndarray]:
    """The lean scan body: only the truly sequential work.

    Everything frame-local arrives precomputed in ``pre`` (chunk.py); this
    body performs just the carry-dependent remainder (analyze_frame_hoisted)
    plus the RNN and gain application + synthesis.
    """
    feat_state, an = analyze_frame_hoisted(carry.feat, pre)
    return _denoise_tail(params, meta, carry, feat_state, an)


def _denoise_tail(
    params: dict,
    meta: ModelMeta,
    carry: DenoiseCarry,
    feat_state: FeatureState,
    an: Analysis,
) -> tuple[DenoiseCarry, jnp.ndarray, jnp.ndarray]:
    silence = an.silence

    # --- RNN (state masked on silence, denoise.rs:102-112) ------------------
    rnn_new, gains, vad = rnn_step(params, meta, carry.rnn, an.features)
    rnn_next = jax.tree_util.tree_map(
        lambda new, old: jnp.where(silence, old, new), rnn_new, carry.rnn
    )
    vad = jnp.where(silence, _F32(0.0), vad)

    # --- pitch comb filter + gain hangover + gain application ----------------
    x_combed = _pitch_filter(an.x, an.p, an.ex, an.ep, an.exp, gains)
    g2 = jnp.maximum(gains, _F32(0.6) * carry.lastg)
    gf = interp_band_gain(g2)
    x_gained = x_combed * gf[None, :]
    x_final = jnp.where(silence, an.x, x_gained)
    lastg_next = jnp.where(silence, carry.lastg, g2)

    # --- synthesis: irfft + window + overlap-add (features.rs:263-275) -------
    y = inverse_transform(x_final)  # (960,)
    out = y[:FRAME_SIZE] + carry.synthesis_mem
    synthesis_mem = y[FRAME_SIZE:]

    new_carry = DenoiseCarry(
        feat=feat_state,
        synthesis_mem=synthesis_mem,
        rnn=rnn_next,
        lastg=lastg_next,
    )
    return new_carry, out, vad
