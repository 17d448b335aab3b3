"""Lag-exact pitch cross-check: JAX production path vs native C++ engine.

The reference's pitch selection is a chain of sequential f32 comparisons
(find_best_pitch pitch.rs:372-405, remove_doubling pitch.rs:118-221) whose
±1-lag outcome audibly changes the output.  The JAX engine re-derives these
decisions with parallel formulations (dense convs, window-norm correlations,
masked argmax), so this test pins them frame-by-frame against the
independently implemented sequential native engine on real audio.
"""

import numpy as np
import pytest

from nnnoiseless_tpu import native


@pytest.fixture(scope="module")
def traces(testing_raw):
    from nnnoiseless_tpu.tools.trace import pitch_trace, pitch_trace_native

    try:
        native.load_library()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native engine unavailable: {e}")
    pj, gj = pitch_trace(testing_raw)
    pn, gn = pitch_trace_native(testing_raw)
    return pj, gj, pn, gn


def test_periods_lag_exact(traces):
    pj, _, pn, _ = traces
    neq = pj != pn
    # Bit-level f32 reassociation can flip a near-tied argmax; allow at most
    # 2 of 100 frames to differ, and then only by the +-2 the decision
    # structure permits.  Measured on CPU: 0 mismatches.
    assert neq.sum() <= 2, (
        f"{neq.sum()} pitch-period mismatches at frames {np.nonzero(neq)[0]}: "
        f"jax={pj[neq]} native={pn[neq]}"
    )
    if neq.any():
        assert np.abs(pj[neq].astype(int) - pn[neq].astype(int)).max() <= 2


def test_gains_match(traces):
    pj, gj, pn, gn = traces
    eq = pj == pn
    assert np.abs(gj[eq] - gn[eq]).max() < 5e-3
