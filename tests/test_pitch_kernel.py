"""The fused pitch-analysis Pallas kernel must match the XLA pitch chain.

Runs in interpreter mode on CPU (the TPU lane exercises the compiled
kernel through the golden CLI / bench and the flip-budget lane).  Both
paths are pure functions of the raw (R, 864) downsampled windows, so this
pins the kernel's in-VMEM re-implementation of whiten (pitch.rs:448-483),
the shared 385-lag correlation, the two-stage search (pitch.rs:63-115)
and the octave-removal candidate tables (pitch.rs:118-221).

Decision quantities (pitch index, candidate t-lanes) must match EXACTLY.
Float lanes (raw correlations/energies) are compared to the row's
magnitude scale: the whitening LPC solve is ill-conditioned for strongly
periodic rows, so f32-ulp differences in the autocorrelation reductions
amplify into ~1e-3 consistent shifts of the whitened signal — the
gains (ratios) self-cancel and decisions are unaffected, which is exactly
the robustness contract the native-engine cross-check (test_pitch_trace)
already establishes for the XLA chain itself.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nnnoiseless_tpu.constants import (
    FRAME_SIZE,
    PITCH_BUF_SIZE,
    PITCH_FRAME_DS,
    PITCH_MAX_DS,
    PITCH_MAX_PERIOD,
)
from nnnoiseless_tpu.ops.fft import xcorr_dft
from nnnoiseless_tpu.ops.pitch import (
    doubling_candidates,
    doubling_tables,
    pitch_search,
    whiten,
    window_energies,
)
from nnnoiseless_tpu.ops.pitch_kernel import (
    pitch_analysis_pallas,
    pitch_analysis_stream,
)

T_LANES = [0] + list(range(4, 18))  # t0 + t1(k=2..15): exact small ints
G_LANES = [1] + list(range(46, 60))  # g0 + g1: decision ratios


def _xla_chain(flat):
    x_lp = jax.vmap(whiten)(flat)
    corr = xcorr_dft(x_lp[:, PITCH_MAX_DS:], x_lp, PITCH_MAX_DS + 1)
    energies = window_energies(x_lp, PITCH_FRAME_DS, PITCH_MAX_DS + 1)
    search = jax.vmap(pitch_search)(x_lp, corr, energies)
    pitch_idx = PITCH_MAX_PERIOD - search
    cf, yyl, xx = jax.vmap(doubling_tables)(x_lp, corr, energies)
    cand = jax.vmap(doubling_candidates)(cf, yyl, xx, pitch_idx)
    return cand, pitch_idx


def _windows_from_signal(sig: np.ndarray) -> np.ndarray:
    """Per-frame 2x-downsampled 864 windows with the reference's
    window-local x[-1] = 0 boundary (pitch.rs:455-458)."""
    wins = np.stack(
        [
            sig[s : s + PITCH_BUF_SIZE]
            for s in range(0, len(sig) - PITCH_BUF_SIZE, FRAME_SIZE)
        ]
    )
    odd = wins[:, 1::2]
    ds = ((np.concatenate([np.zeros((len(wins), 1)), odd[:, :-1]], axis=1) + odd)
          * 0.5 + wins[:, 0::2]) * 0.5
    ds[:, 0] = (odd[:, 0] * 0.5 + wins[:, 0]) * 0.5
    return ds.astype(np.float32)


@pytest.fixture(scope="module")
def batches(testing_raw):
    rng = np.random.RandomState(7)
    t = np.arange(864) / 24000.0
    rows = []
    for _ in range(96):
        f0 = rng.uniform(60, 350)
        sig = sum(
            np.sin(2 * np.pi * f0 * h * t + rng.rand() * 6) / h
            for h in range(1, 6)
        )
        rows.append(
            sig * rng.uniform(10, 3000) + rng.randn(864) * rng.uniform(0.1, 300)
        )
    synth = np.stack(rows).astype(np.float32)
    real = _windows_from_signal(testing_raw.astype(np.float64))[:96]
    return jnp.asarray(synth), jnp.asarray(real)


@pytest.mark.parametrize("which", ["synthetic", "golden"])
def test_decisions_match_xla_chain(batches, which):
    flat = batches[0] if which == "synthetic" else batches[1]
    cand_ref, pidx_ref = _xla_chain(flat)
    cand, pidx = pitch_analysis_pallas(flat, interpret=True)

    np.testing.assert_array_equal(np.asarray(pidx), np.asarray(pidx_ref))
    c, cr = np.asarray(cand), np.asarray(cand_ref)
    np.testing.assert_array_equal(c[:, T_LANES], cr[:, T_LANES])
    assert np.abs(c[:, G_LANES] - cr[:, G_LANES]).max() < 1e-3
    rowscale = np.abs(cr).max(axis=1, keepdims=True) + 1.0
    assert (np.abs(c - cr) / rowscale).max() < 5e-3


def test_row_padding(batches):
    """Row counts that are not a block multiple pad with silent rows."""
    flat = batches[0][:37]
    cand_ref, pidx_ref = _xla_chain(flat)
    cand, pidx = pitch_analysis_pallas(flat, interpret=True)
    assert cand.shape == (37, 105) and pidx.shape == (37,)
    np.testing.assert_array_equal(np.asarray(pidx), np.asarray(pidx_ref))


@pytest.mark.parametrize("b", [5, 3])  # incl. a non-block-multiple batch
def test_stream_matches_stacked(b):
    """The sliding-window (scratch-carried) kernel consumes IDENTICAL
    window contents (incl. the lane-0 boundary patch) as the stacked
    kernel — only the DMA shape differs.  Decisions must match exactly;
    float lanes get the same row-scale bar as the XLA-chain test (the two
    interpret graphs fuse differently, so reduction-order f32 ulps pass
    through the ill-conditioned whitening LPC, exactly as documented in
    the module docstring)."""
    t = 4
    rng = np.random.RandomState(11)
    ds = jnp.asarray((rng.randn(b, 864 + 240 * t) * 3000).astype(np.float32))
    w0 = jnp.asarray((rng.randn(t, b) * 3000).astype(np.float32))
    wins = jnp.stack(
        [ds[:, 240 + 240 * k : 1104 + 240 * k] for k in range(t)], axis=0
    ).at[..., 0].set(w0)
    c_stk, p_stk = pitch_analysis_pallas(
        wins.reshape(t * b, 864), interpret=True
    )
    c_str, p_str = pitch_analysis_stream(ds, w0, t, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(p_stk).reshape(t, b), np.asarray(p_str)
    )
    c, cr = np.asarray(c_str).reshape(t * b, 105), np.asarray(c_stk)
    np.testing.assert_array_equal(c[:, T_LANES], cr[:, T_LANES])
    assert np.abs(c[:, G_LANES] - cr[:, G_LANES]).max() < 1e-3
    rowscale = np.abs(cr).max(axis=1, keepdims=True) + 1.0
    assert (np.abs(c - cr) / rowscale).max() < 5e-3
