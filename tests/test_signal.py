"""Streaming iterator adapter tests (reference src/signal.rs semantics).

Covers: first-output-frame discard, the +-1.0 <-> i16 rescaling round trip,
multi-channel sources, output clamping, and equivalence with the core
denoise path.
"""

import numpy as np

from nnnoiseless_tpu import FRAME_SIZE, DenoiseSignal, denoise_audio


def test_mono_equivalence(testing_raw, default_model):
    """The adapter must produce denoise_audio's output scaled to [-1, 1],
    with the first frame dropped (signal.rs:83-87)."""
    n = 6 * FRAME_SIZE
    src = (testing_raw[:n] / 32768.0).tolist()
    got = np.asarray(list(DenoiseSignal(src, default_model)), np.float32)
    want = denoise_audio(testing_raw[:n], default_model, drop_first_frame=True)
    want = np.clip(want / 32768.0, -1.0, 1.0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_multichannel_tuples(default_model):
    rng = np.random.RandomState(0)
    n = 3 * FRAME_SIZE
    stereo = (rng.randn(n, 2) * 0.05).astype(np.float32)
    out = list(DenoiseSignal([tuple(s) for s in stereo], default_model))
    assert len(out) == n - FRAME_SIZE  # first frame dropped
    assert all(len(s) == 2 for s in out)
    arr = np.asarray(out)
    assert np.all(np.abs(arr) <= 1.0)


def test_short_source_zero_pads():
    """A source shorter than two frames still yields one (padded) frame."""
    out = list(DenoiseSignal([0.0] * (FRAME_SIZE + 10)))
    assert len(out) == FRAME_SIZE  # frame 0 dropped, frame 1 (padded) kept
    np.testing.assert_allclose(out, 0.0, atol=1e-4)


def test_empty_source():
    assert list(DenoiseSignal([])) == []


def test_constructor_aliases(default_model):
    a = DenoiseSignal.new([0.0] * FRAME_SIZE)
    b = DenoiseSignal.with_model([0.0] * FRAME_SIZE, default_model)
    c = DenoiseSignal.from_model([0.0] * FRAME_SIZE, default_model)
    for sig in (a, b, c):
        assert list(sig) == []  # single frame: dropped, nothing to yield
