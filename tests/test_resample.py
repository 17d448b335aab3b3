"""Quantitative quality bars for the CLI input resampler.

The reference resamples non-48 kHz input with dasp's 16-tap windowed-sinc
interpolator (/root/reference/src/nnnoiseless.rs:19-33,106-131); ours is a
Hann-windowed 16-tap sinc (audio_io.py::resample_to_48k).  The golden oracle
never exercises non-48 kHz input, so these tests pin the claim of equivalent
quality directly: pure tones resampled to 48 kHz are compared against the
exact analytic tone at 48 kHz (output sample k lands at t = (k+1)/48000 s),
giving a true passband-SNR measurement with no second resampler in the loop.

Measured envelope (numpy f64 oracle): 61.9-94.7 dB for tones up to
0.68x input Nyquist at 44.1/32/24 kHz; DC gain flat to <4e-4.  Bars sit
comfortably below the measured floor so they catch real regressions
(wrong window, off-by-one tap alignment, broken normalization) without
flaking on platform math differences.
"""

import numpy as np
import pytest

from nnnoiseless_tpu.audio_io import resample_to_48k

EDGE = 32  # skip filter warmup/teardown at the buffer edges


def _tone_snr(rate: int, freq: float) -> float:
    n = rate // 2
    t_in = np.arange(n) / rate
    x = (10_000.0 * np.sin(2 * np.pi * freq * t_in)).astype(np.float32)
    y = resample_to_48k(x[:, None], rate)[:, 0].astype(np.float64)
    k = np.arange(1, len(y) + 1)
    ideal = 10_000.0 * np.sin(2 * np.pi * freq * k / 48_000.0)
    m = slice(EDGE, len(y) - EDGE)
    err = y[m] - ideal[m]
    return 10 * np.log10(np.sum(ideal[m] ** 2) / np.sum(err ** 2))


@pytest.mark.parametrize(
    "rate,freq,floor_db",
    [
        (44_100, 440, 65),
        (44_100, 1_000, 70),
        (44_100, 4_000, 80),
        (44_100, 10_000, 58),
        (44_100, 15_000, 55),  # 0.68x Nyquist — band edge for speech
        (32_000, 1_000, 80),
        (32_000, 8_000, 55),
        (24_000, 4_000, 60),
        (24_000, 8_000, 55),
    ],
)
def test_tone_passband_snr(rate, freq, floor_db):
    snr = _tone_snr(rate, freq)
    assert snr >= floor_db, f"{rate} Hz -> 48k @ {freq} Hz: {snr:.1f} dB"


@pytest.mark.parametrize("rate", [44_100, 32_000, 24_000])
def test_dc_gain_flat(rate):
    """The Hann-sinc taps must sum to ~1 at every fractional phase."""
    y = resample_to_48k(np.full((rate, 1), 1000.0, np.float32), rate)[:, 0]
    dev = np.abs(y[EDGE:-EDGE] / 1000.0 - 1.0).max()
    assert dev < 1e-3, f"DC gain deviation {dev:.2e}"


def test_output_length_and_channels():
    x = np.zeros((44_100, 2), np.float32)
    y = resample_to_48k(x, 44_100)
    assert y.shape == (48_000, 2)


def test_48k_passthrough_identity():
    x = np.random.RandomState(0).randn(480, 1).astype(np.float32)
    assert resample_to_48k(x, 48_000) is x
