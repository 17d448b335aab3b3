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


def test_signal_full_golden(testing_raw, reference_output):
    """The analogue of the reference's compare_signal_to_reference
    (src/lib.rs:215-227): the ENTIRE golden file through the Signal
    adapter with the x32768 scaling round trip, against the same 1e-4
    relative-squared-error oracle."""
    src = testing_raw / 32768.0
    out = np.fromiter(iter(DenoiseSignal(src)), np.float64) * 32768.0
    n = min(len(out), len(reference_output))
    assert n == len(reference_output)  # adapter covers the whole golden file
    o = out[:n].astype(np.int16).astype(np.float64)
    ref = reference_output[:n].astype(np.float64)
    err = np.sum((ref - o) ** 2) / np.sum(o**2)
    print(f"signal-adapter golden relative squared error: {err:.3e}")
    assert err < 1e-4


def test_multichannel_tuples(default_model):
    rng = np.random.RandomState(0)
    n = 3 * FRAME_SIZE
    stereo = (rng.randn(n, 2) * 0.05).astype(np.float32)
    out = list(DenoiseSignal([tuple(s) for s in stereo], default_model))
    assert len(out) == n - FRAME_SIZE  # first frame dropped
    assert all(len(s) == 2 for s in out)
    arr = np.asarray(out)
    assert np.all(np.abs(arr) <= 1.0)


def test_chunked_dispatch(default_model, monkeypatch):
    """One device dispatch must cover up to ``latency_frames`` frames (the
    dispatch-amortization requirement for real-time streaming,
    docs/PERFORMANCE.md) while producing the same samples."""
    from nnnoiseless_tpu.denoise import StreamBatch

    calls = []
    orig = StreamBatch.process

    def spy(self, frames):
        calls.append(frames.shape)
        return orig(self, frames)

    monkeypatch.setattr(StreamBatch, "process", spy)
    n = 7 * FRAME_SIZE
    src = np.zeros(n, np.float32)
    out = list(DenoiseSignal(src, default_model, latency_frames=4))
    assert [c[1] for c in calls] == [4, 3]  # 7 frames in two dispatches
    assert len(out) == n - FRAME_SIZE  # first frame dropped


def test_latency_one_matches_chunked(testing_raw, default_model):
    """latency_frames=1 (reference-equivalent per-frame pull) and the
    default chunked mode must produce the same stream."""
    n = 5 * FRAME_SIZE
    src = (testing_raw[:n] / 32768.0).astype(np.float64)
    a = np.asarray(list(DenoiseSignal(src, default_model, latency_frames=1)))
    b = np.asarray(list(DenoiseSignal(src, default_model, latency_frames=50)))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_partial_tail_exact_length():
    """Output length == input length minus the discarded fade-in frame:
    the zero-padded tail of a partial final frame is never emitted."""
    out = list(DenoiseSignal([0.0] * (FRAME_SIZE + 10)))
    assert len(out) == 10  # frame 0 dropped; only the 10 real tail samples
    np.testing.assert_allclose(out, 0.0, atol=1e-4)

    out2 = list(DenoiseSignal([0.0] * (3 * FRAME_SIZE + 7)))
    assert len(out2) == 2 * FRAME_SIZE + 7


def test_empty_source():
    assert list(DenoiseSignal([])) == []


def test_constructor_aliases(default_model):
    a = DenoiseSignal.new([0.0] * FRAME_SIZE)
    b = DenoiseSignal.with_model([0.0] * FRAME_SIZE, default_model)
    c = DenoiseSignal.from_model([0.0] * FRAME_SIZE, default_model)
    for sig in (a, b, c):
        assert list(sig) == []  # single frame: dropped, nothing to yield
