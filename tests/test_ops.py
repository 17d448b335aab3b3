"""Unit tests for the DSP/NN primitive ops against independent oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnnoiseless_tpu.ops.activations import relu, sigmoid_approx, tansig_approx
from nnnoiseless_tpu.ops.bands import band_corr, dct22, interp_band_gain
from nnnoiseless_tpu.ops.biquad import biquad_filter
from nnnoiseless_tpu.ops.fft import forward_transform, inverse_transform
from nnnoiseless_tpu.ops.pitch import (
    autocorr5,
    downsample_2x,
    find_best_pitch,
    lpc4,
    sliding_dot,
)
from nnnoiseless_tpu.tables import (
    BIQUAD_HP_A,
    BIQUAD_HP_B,
    TANSIG_TABLE,
    VORBIS_WINDOW,
    WNORM,
)


def _tansig_scalar(x: float) -> float:
    """Scalar oracle of the reference's tansig_approx (util.rs:29-45)."""
    f = np.float32
    x = f(x)
    if not (x < 8.0):
        return 1.0
    if not (x > -8.0):
        return -1.0
    sign = 1.0
    if x < 0.0:
        x, sign = -x, -1.0
    i = np.floor(f(0.5) + f(25.0) * x)
    x = f(x - f(0.04) * i)
    y = TANSIG_TABLE[int(i)]
    dy = f(1.0) - f(y * y)
    y = f(y + f(f(x * dy) * f(f(1.0) - f(y * x))))
    return float(sign * y)


def test_tansig_matches_scalar_oracle():
    xs = np.concatenate(
        [
            np.linspace(-10, 10, 2001),
            np.array([0.0, -0.0, 7.999, -7.999, 8.0, -8.0, np.nan, np.inf, -np.inf]),
        ]
    ).astype(np.float32)
    got = np.asarray(jax.jit(tansig_approx)(xs))
    want = np.array([_tansig_scalar(float(x)) for x in xs], np.float32)
    np.testing.assert_allclose(got, want, atol=2e-7)


def test_tansig_close_to_tanh():
    xs = np.linspace(-5, 5, 101).astype(np.float32)
    np.testing.assert_allclose(np.asarray(tansig_approx(xs)), np.tanh(xs), atol=1e-5)


def test_sigmoid_relu():
    xs = np.linspace(-20, 20, 101).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(sigmoid_approx(xs)), 1 / (1 + np.exp(-xs.astype(np.float64))), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(relu(xs)), np.maximum(xs, 0))


def test_biquad_matches_f64_oracle():
    rng = np.random.RandomState(0)
    x = (rng.randn(4 * 480) * 10000).astype(np.float32)
    a = BIQUAD_HP_A.astype(np.float64)
    b = BIQUAD_HP_B.astype(np.float64)
    mem = np.zeros(2, np.float64)
    want = np.empty_like(x)
    for i, xn in enumerate(x.astype(np.float64)):
        y = xn + mem[0]
        mem0 = mem[1] + (b[0] * xn - a[0] * y)
        mem1 = b[1] * xn - a[1] * y
        mem = np.array([np.float32(mem0), np.float32(mem1)], np.float64)
        want[i] = np.float32(y)
    got, _ = jax.jit(
        lambda x, m: biquad_filter(x, m, jnp.asarray(BIQUAD_HP_A), jnp.asarray(BIQUAD_HP_B))
    )(x, jnp.zeros(2, jnp.float32))
    # f32 arithmetic vs the reference's f64 inner math: bounded drift (the
    # reference itself rounds its state to f32 every sample; ~1.0 absolute on
    # i16-scale signals is ~3e-5 relative)
    np.testing.assert_allclose(np.asarray(got), want, atol=1.5)
    # chunked == one-shot (state carry correctness); tiny tolerance since
    # different chunk lengths compile to separate XLA programs
    jf = jax.jit(
        lambda x, m: biquad_filter(x, m, jnp.asarray(BIQUAD_HP_A), jnp.asarray(BIQUAD_HP_B))
    )
    g1, m1 = jf(jnp.asarray(x[:480]), jnp.zeros(2, jnp.float32))
    g2, _ = jf(jnp.asarray(x[480:]), m1)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(g1), np.asarray(g2)]), np.asarray(got), atol=1e-2
    )


def test_band_corr_matches_loop():
    from nnnoiseless_tpu.constants import EBAND_5MS, FREQ_SIZE, NB_BANDS

    rng = np.random.RandomState(1)
    x = rng.randn(2, FREQ_SIZE).astype(np.float32)  # packed (re, im)
    p = rng.randn(2, FREQ_SIZE).astype(np.float32)
    want = np.zeros(NB_BANDS)
    for i in range(NB_BANDS - 1):
        size = (EBAND_5MS[i + 1] - EBAND_5MS[i]) * 4
        for j in range(size):
            frac = j / size
            idx = EBAND_5MS[i] * 4 + j
            c = x[0, idx] * p[0, idx] + x[1, idx] * p[1, idx]
            want[i] += (1 - frac) * c
            want[i + 1] += frac * c
    want[0] *= 2
    want[-1] *= 2
    got = np.asarray(band_corr(jnp.asarray(x), jnp.asarray(p)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_interp_band_gain_matches_loop():
    from nnnoiseless_tpu.constants import EBAND_5MS, FREQ_SIZE, NB_BANDS

    rng = np.random.RandomState(2)
    g = rng.rand(NB_BANDS).astype(np.float32)
    want = np.zeros(FREQ_SIZE, np.float32)
    for i in range(NB_BANDS - 1):
        size = (EBAND_5MS[i + 1] - EBAND_5MS[i]) * 4
        for j in range(size):
            frac = j / size
            want[EBAND_5MS[i] * 4 + j] = (1 - frac) * g[i] + frac * g[i + 1]
    got = np.asarray(interp_band_gain(jnp.asarray(g)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dct22_matches_direct():
    rng = np.random.RandomState(3)
    x = rng.randn(22).astype(np.float32)
    want = np.zeros(22)
    for i in range(22):
        s = 0.0
        for j in range(22):
            t = np.cos((j + 0.5) * i * np.pi / 22)
            if i == 0:
                t *= np.sqrt(0.5)
            s += x[j] * t
        want[i] = s * np.sqrt(2 / 22)
    got = np.asarray(dct22(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fft_roundtrip():
    rng = np.random.RandomState(4)
    frame = (rng.randn(960) * 1000).astype(np.float32)
    spec = forward_transform(jnp.asarray(frame))
    assert spec.shape == (2, 481)
    # packed spectrum must match numpy's rfft of the windowed frame
    w = VORBIS_WINDOW
    ref_spec = np.fft.rfft(frame * w) * WNORM
    np.testing.assert_allclose(np.asarray(spec[0]), ref_spec.real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(spec[1]), ref_spec.imag, atol=2e-3)
    back = np.asarray(inverse_transform(spec))
    # forward includes *wnorm and window; inverse includes *480 and window:
    # net round-trip = frame * window^2 * wnorm * 960/2... verify against direct
    expected = (
        np.fft.irfft(np.fft.rfft(frame * w) * WNORM, 960) * 480 * w
    )
    np.testing.assert_allclose(back, expected, atol=1e-2)


def test_downsample_and_autocorr():
    rng = np.random.RandomState(5)
    x = rng.randn(1728).astype(np.float32)
    ds = np.asarray(downsample_2x(jnp.asarray(x)))
    want = np.empty(864, np.float32)
    want[0] = (x[1] / 2 + x[0]) / 2
    for i in range(1, 864):
        want[i] = ((x[2 * i - 1] + x[2 * i + 1]) / 2 + x[2 * i]) / 2
    np.testing.assert_allclose(ds, want, atol=1e-6)

    ac = np.asarray(autocorr5(jnp.asarray(ds)))
    for k in range(5):
        np.testing.assert_allclose(
            ac[k], np.dot(ds[: 864 - k].astype(np.float64), ds[k:].astype(np.float64)),
            rtol=1e-5,
        )


def test_lpc_whitens():
    # LPC of an AR(1) process should approximately invert it
    rng = np.random.RandomState(6)
    n = 864
    e = rng.randn(n).astype(np.float32)
    x = np.empty(n, np.float32)
    acc = 0.0
    for i in range(n):
        acc = 0.9 * acc + e[i]
        x[i] = acc
    ac = autocorr5(jnp.asarray(x))
    ac = ac.at[0].multiply(1.0001)
    c = np.asarray(lpc4(ac))
    # first coefficient should be close to -0.9 (predictor x[t] ~ 0.9 x[t-1])
    assert abs(c[0] + 0.9) < 0.05


def test_lpc_zero_input():
    c = np.asarray(lpc4(jnp.zeros(5)))
    np.testing.assert_array_equal(c, 0.0)


def test_sliding_dot():
    rng = np.random.RandomState(7)
    x = rng.randn(240).astype(np.float32)
    y = rng.randn(387).astype(np.float32)
    got = np.asarray(sliding_dot(jnp.asarray(x), jnp.asarray(y), 147))
    want = np.array(
        [np.dot(x.astype(np.float64), y[i : i + 240].astype(np.float64)) for i in range(147)]
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_find_best_pitch_simple():
    # A strong periodic signal: the best lag must win over the runner-up.
    n = 387
    t = np.arange(n)
    y = np.sin(2 * np.pi * t / 50).astype(np.float32)
    x = y[100 : 100 + 240]
    xc = np.asarray(sliding_dot(jnp.asarray(x), jnp.asarray(y), 147))
    best, second = jax.jit(lambda a, b: find_best_pitch(a, b, 240))(
        jnp.asarray(xc), jnp.asarray(y)
    )
    assert int(best) % 50 == 0
    assert int(second) != int(best)


def test_find_best_pitch_all_nonpositive():
    # No positive correlations: reference returns initial (0, 1).
    xc = -np.ones(147, np.float32)
    y = np.ones(387, np.float32)
    best, second = find_best_pitch(jnp.asarray(xc), jnp.asarray(y), 240)
    assert int(best) == 0 and int(second) == 1


def test_biquad_frames_modal_carry_vs_f64_oracle():
    """The chunk-hoisted biquad's modal-basis closed-form carry
    (ops/biquad._carry_prop_tables) must track a sequential f64 oracle
    tightly on CPU — the pre-modal forms lost ~5 i16 units at high
    amplitude from Q's non-normal (+-144-entry) powers, invisible to
    scan-comparison tests because both forms wobbled together.  Also
    covers random training-augmentation-style coefficients (real and
    complex pole pairs) and the carry handoff across chunks."""
    from nnnoiseless_tpu.ops.biquad import biquad_filter_frames
    from nnnoiseless_tpu.tables import BIQUAD_HP_A, BIQUAD_HP_B

    def oracle(x, m, a, b):
        y = np.empty_like(x, np.float64)
        m0, m1 = np.float64(m[0]), np.float64(m[1])
        for i, xn in enumerate(x.astype(np.float64)):
            yv = xn + m0
            m0, m1 = m1 + (b[0] * xn - a[0] * yv), b[1] * xn - a[1] * yv
            y[i] = yv
        return y, np.array([m0, m1])

    rng = np.random.RandomState(11)
    hp_a = tuple(float(v) for v in BIQUAD_HP_A)
    hp_b = tuple(float(v) for v in BIQUAD_HP_B)
    # high-amplitude stress: the HP filter, 100 frames, carry handoff
    x = (rng.randn(2, 100, 480) * 20000).astype(np.float32)
    m = (rng.randn(2, 2) * 10).astype(np.float32)
    got, gmem = jax.jit(
        lambda fr, mm: biquad_filter_frames(fr, mm, hp_a, hp_b)
    )(jnp.asarray(x), jnp.asarray(m))
    for i in range(2):
        want, wmem = oracle(x[i].reshape(-1), m[i], hp_a, hp_b)
        err = np.abs(np.asarray(got[i], np.float64).reshape(-1) - want).max()
        assert err <= 0.05, f"stream {i}: max err {err} i16 units"
        assert np.abs(np.asarray(gmem[i], np.float64) - wmem).max() <= 0.05
    # random biquads in the training-augmentation coefficient range
    for trial in range(4):
        c = rng.uniform(-0.375, 0.375, 4)
        aa, bb = (float(c[0]), float(c[1])), (float(c[2]), float(c[3]))
        xr = (rng.randn(1, 10, 480) * 3000).astype(np.float32)
        yr, _ = jax.jit(
            lambda fr, mm: biquad_filter_frames(fr, mm, aa, bb)
        )(jnp.asarray(xr), jnp.zeros((1, 2), jnp.float32))
        want, _ = oracle(xr[0].reshape(-1), np.zeros(2), aa, bb)
        err = np.abs(np.asarray(yr, np.float64).reshape(-1) - want).max()
        assert err <= 0.05, f"random biquad {trial}: max err {err}"


def test_biquad_dense_matches_scan():
    """The unrolled-matmul biquad must match the sequential scan closely,
    including the carry handoff across chunks."""
    from nnnoiseless_tpu.ops.biquad import biquad_filter, biquad_filter_dense
    from nnnoiseless_tpu.tables import BIQUAD_HP_A, BIQUAD_HP_B

    rng = np.random.RandomState(7)
    x = (rng.randn(960) * 8000).astype(np.float32)
    a = tuple(float(v) for v in BIQUAD_HP_A)
    b = tuple(float(v) for v in BIQUAD_HP_B)

    m0 = jnp.zeros(2, jnp.float32)
    want1, wmem = biquad_filter(jnp.asarray(x[:480]), m0, jnp.asarray(BIQUAD_HP_A), jnp.asarray(BIQUAD_HP_B))
    want2, _ = biquad_filter(jnp.asarray(x[480:]), wmem, jnp.asarray(BIQUAD_HP_A), jnp.asarray(BIQUAD_HP_B))
    got1, gmem = biquad_filter_dense(jnp.asarray(x[:480]), m0, a, b)
    got2, _ = biquad_filter_dense(jnp.asarray(x[480:]), gmem, a, b)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), atol=2.0)
    np.testing.assert_allclose(np.asarray(gmem), np.asarray(wmem), rtol=1e-3, atol=2.0)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=2.0)
    # batched
    xb = (rng.randn(3, 480) * 2000).astype(np.float32)
    mb = (rng.randn(3, 2) * 10).astype(np.float32)
    wb, wmb = biquad_filter(jnp.asarray(xb), jnp.asarray(mb), jnp.asarray(BIQUAD_HP_A), jnp.asarray(BIQUAD_HP_B))
    gb, gmb = biquad_filter_dense(jnp.asarray(xb), jnp.asarray(mb), a, b)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(wb), atol=2.0)
    np.testing.assert_allclose(np.asarray(gmb), np.asarray(wmb), atol=2.0)


def test_window_at_lag_variants():
    """Barrel shifter == dynamic slice; Pallas kernel (interpret) == barrel."""
    import jax
    from nnnoiseless_tpu.constants import PITCH_BUF_SIZE, WINDOW_SIZE
    from nnnoiseless_tpu.ops.window import (
        _barrel_shift_window,
        _pallas_window,
        window_at_lag,
    )

    rng = np.random.RandomState(11)
    b = 256  # one Pallas block
    mem = jnp.asarray(rng.randn(b, PITCH_BUF_SIZE).astype(np.float32))
    lag = jnp.asarray(rng.randint(0, 769, size=b).astype(np.int32))

    want = np.stack(
        [
            np.asarray(mem[i])[
                PITCH_BUF_SIZE - WINDOW_SIZE - int(lag[i]) : PITCH_BUF_SIZE - int(lag[i])
            ]
            for i in range(b)
        ]
    )
    got_barrel = np.asarray(_barrel_shift_window(mem, lag))
    np.testing.assert_array_equal(got_barrel, want)

    got_pallas = np.asarray(_pallas_window(mem, lag, interpret=True))
    np.testing.assert_array_equal(got_pallas, want)

    got_vmap = np.asarray(jax.vmap(window_at_lag)(mem, lag))
    np.testing.assert_array_equal(got_vmap, want)


def test_rnn_pallas_kernel_matches_xla():
    """The fused Pallas RNN kernel (interpret mode) must match the XLA cell."""
    from nnnoiseless_tpu import RnnModel
    from nnnoiseless_tpu.ops.rnn import RnnState, rnn_step
    from nnnoiseless_tpu.ops import rnn_pallas as rp

    m = RnnModel.default()
    rng = np.random.RandomState(13)
    b = rp._BLOCK  # one block
    state = RnnState(
        vad=jnp.asarray(rng.randn(b, 24).astype(np.float32) * 0.5),
        noise=jnp.asarray(np.maximum(rng.randn(b, 48), 0).astype(np.float32)),
        denoise=jnp.asarray(rng.randn(b, 96).astype(np.float32) * 0.5),
    )
    feats = jnp.asarray((rng.randn(b, 42) * 2).astype(np.float32))

    want_state, want_g, want_v = rnn_step(m.params, m.meta, state, feats)

    weights = rp._flatten_params(m.params)
    hv, hn, hd, got_g, got_v = rp._rnn_pallas(
        weights, state.vad, state.noise, state.denoise, feats,
        rp.meta_acts(m.meta), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(hv), np.asarray(want_state.vad), atol=2e-6)
    np.testing.assert_allclose(np.asarray(hn), np.asarray(want_state.noise), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hd), np.asarray(want_state.denoise), atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g), atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_v[:, 0]), np.asarray(want_v), atol=2e-6)
