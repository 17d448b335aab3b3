"""Constant-table invariants (window, DCT, band matrices, tansig table)."""

import numpy as np

from nnnoiseless_tpu.constants import EBAND_5MS, FREQ_SIZE, NB_BANDS, WINDOW_SIZE
from nnnoiseless_tpu.tables import (
    BAND_CORR_MATRIX,
    BAND_INTERP_MATRIX,
    DCT_SCALE,
    DCT_TABLE,
    TANSIG_TABLE,
    VORBIS_WINDOW,
    WNORM,
)


def test_window_properties():
    w = VORBIS_WINDOW
    assert w.shape == (WINDOW_SIZE,)
    assert np.all(w >= 0) and np.all(w <= 1)
    # symmetric
    np.testing.assert_array_equal(w, w[::-1])
    # power-complementary at 50% overlap: w[i]^2 + w[i+480]^2 == 1
    np.testing.assert_allclose(w[:480] ** 2 + w[480:] ** 2, 1.0, atol=1e-6)
    np.testing.assert_allclose(1.0 / WNORM, np.sum(w.astype(np.float64) ** 2), rtol=1e-6)


def test_dct_table_orthogonality():
    # Rows of (T * scale) with the sqrt(1/2) DC scaling form an orthonormal set:
    # the forward transform out = x @ T * scale satisfies ||out|| == ||x||.
    t = DCT_TABLE.astype(np.float64) * float(DCT_SCALE)
    gram = t.T @ t  # (22, 22)
    np.testing.assert_allclose(gram, np.eye(NB_BANDS), atol=1e-5)


def test_band_matrices():
    corr = BAND_CORR_MATRIX
    interp = BAND_INTERP_MATRIX
    assert corr.shape == (NB_BANDS, FREQ_SIZE)
    assert interp.shape == (FREQ_SIZE, NB_BANDS)
    # interpolating all-ones band gains gives 1.0 on bins < 400, 0 above
    ones = interp @ np.ones(NB_BANDS, np.float32)
    top = EBAND_5MS[-1] * 4
    np.testing.assert_allclose(ones[:top], 1.0, atol=1e-6)
    np.testing.assert_array_equal(ones[top:], 0.0)
    # interior bins: weights sum to 1; bins shared with the doubled first /
    # last band get an extra frac term (lib.rs:80-81)
    colsum = corr.sum(axis=0)
    np.testing.assert_allclose(colsum[4 : EBAND_5MS[-2] * 4], 1.0, atol=1e-6)


def test_tansig_table_formula():
    # Regeneration rule: float32(tanh(0.04 i)) printed with %.6f
    for i in [0, 1, 50, 70, 100, 170, 190, 200]:
        expected = float("%.6f" % np.float32(np.tanh(0.04 * i)))
        assert TANSIG_TABLE[i] == np.float32(expected)
    assert TANSIG_TABLE.shape == (201,)
    assert TANSIG_TABLE[0] == 0.0
    assert TANSIG_TABLE[200] == 1.0
