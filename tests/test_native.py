"""Native (C++) engine parity tests — the tier-3 analogue of the reference's
C-API smoke test (SURVEY.md §4.3: Rust CLI vs C demo byte-diff).

The native engine is an independent implementation; we require it to pass
the same golden oracle as the JAX engine and to agree closely with it.
"""

import shutil

import numpy as np
import pytest

from nnnoiseless_tpu import FRAME_SIZE

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or shutil.which("make") is None,
    reason="no C++ toolchain",
)


@pytest.fixture(scope="module")
def native():
    from nnnoiseless_tpu import native as mod

    mod.load_library()
    return mod


def test_frame_size_and_abi(native):
    lib = native.load_library()
    assert lib.rnnoise_get_frame_size() == FRAME_SIZE
    assert lib.rnnoise_get_size() > 0
    with pytest.raises(ValueError):
        native.NativeModel(b"junk bytes")


def test_native_passes_golden_oracle(native, testing_raw, reference_output):
    out = native.denoise_audio_native(testing_raw)
    oi = out.astype(np.int16)
    xx = np.sum(oi.astype(np.float64) ** 2)
    diff = np.sum((reference_output.astype(np.float64) - oi) ** 2)
    assert diff / xx < 1e-4


def test_native_matches_jax_engine(native, testing_raw, default_model):
    """Two independent implementations of the same spec must agree closely."""
    from nnnoiseless_tpu import denoise_audio

    sig = testing_raw[: 30 * FRAME_SIZE]
    a = native.denoise_audio_native(sig, drop_first_frame=False)
    b = denoise_audio(sig, default_model, drop_first_frame=False)
    corr = np.sum(a.astype(np.float64) * b) / np.sqrt(
        np.sum(a.astype(np.float64) ** 2) * np.sum(b.astype(np.float64) ** 2)
    )
    assert corr > 1 - 1e-6


def test_native_custom_model(native, testing_raw):
    """A converted rnnoise-nu model loads and runs through the C ABI."""
    from conftest import DATA_DIR

    from nnnoiseless_tpu.model import convert_rnnoise

    data = convert_rnnoise((DATA_DIR / "sh.rnnn").read_text())
    model = native.NativeModel(bytes(data))
    st = native.NativeDenoiseState(model)
    out, vad = st.process_frame(np.zeros(FRAME_SIZE, np.float32))
    assert out.shape == (FRAME_SIZE,)
    assert 0.0 <= vad <= 1.0


def test_native_reset(native):
    st = native.NativeDenoiseState()
    rng = np.random.RandomState(0)
    frames = (rng.randn(5, FRAME_SIZE) * 3000).astype(np.float32)
    a, _ = st.process_frames(frames)
    st.reset()
    b, _ = st.process_frames(frames)
    np.testing.assert_array_equal(a, b)


def test_c_demo_byte_identical_to_python_binding(native, tmp_path, testing_raw):
    """Build the C demo against rnnoise.h and require byte-identical output
    with the ctypes path — the analogue of the reference CI's
    `diff out_rust.raw out_c.raw` smoke test."""
    import pathlib
    import subprocess

    native_dir = pathlib.Path(__file__).parent.parent / "native"
    subprocess.run(["make", "-s", "demo"], cwd=native_dir, check=True)
    out_c = tmp_path / "out_c.raw"
    subprocess.run(
        [str(native_dir / "nnt_demo"), str(native_dir.parent / "tests/data/testing.raw"), str(out_c)],
        check=True,
    )
    got_c = np.fromfile(out_c, dtype="<i2")

    out_py = native.denoise_audio_native(testing_raw)
    got_py = np.clip(out_py, -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(got_c, got_py)


def test_library_api_native_engine(native, testing_raw, reference_output):
    """engine="native" on the library API (VERDICT r4 item 3): DenoiseState
    routes through the in-process C++ engine and still passes the golden
    oracle; the reference's design point (src/denoise.rs:87-90) is one live
    stream via exactly this API."""
    from nnnoiseless_tpu import DenoiseState

    st = DenoiseState(engine="native")
    t = len(testing_raw) // FRAME_SIZE
    out, vad = st.process_chunk(testing_raw[: t * FRAME_SIZE].reshape(t, FRAME_SIZE))
    assert vad.shape == (t,)
    oi = out.reshape(-1)[FRAME_SIZE:].astype(np.int16)
    xx = np.sum(oi.astype(np.float64) ** 2)
    diff = np.sum((reference_output.astype(np.float64) - oi) ** 2)
    assert diff / xx < 1e-4

    # reset + per-frame path give the same stream
    st.reset()
    a0, v0 = st.process_frame(testing_raw[:FRAME_SIZE])
    np.testing.assert_array_equal(a0, out[0])


def test_native_process_frame_meets_deadline(native):
    """The real-time bar: a 480-sample frame is 10 ms of audio
    (src/denoise.rs:87-90); the native per-frame path must beat it with
    room to spare.  Median over 200 frames to reject scheduler noise."""
    import time

    from nnnoiseless_tpu import DenoiseState

    st = DenoiseState(engine="native")
    rng = np.random.RandomState(0)
    frames = (rng.randn(200, FRAME_SIZE) * 3000).astype(np.float32)
    st.process_frame(frames[0])  # warm (page-in, caches)
    times = []
    for f in frames:
        t0 = time.perf_counter()
        st.process_frame(f)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"native process_frame median {med*1e3:.3f} ms / 10 ms budget")
    assert med < 0.005, f"median frame time {med*1e3:.2f} ms >= half the deadline"


def test_signal_adapter_native_engine(native, testing_raw):
    """DenoiseSignal(engine="native", latency_frames=1) — the genuinely
    real-time streaming config — matches the TPU-engine adapter."""
    from nnnoiseless_tpu.signal import DenoiseSignal

    sig = testing_raw[: 12 * FRAME_SIZE] / 32768.0
    got_n = np.fromiter(
        DenoiseSignal(iter(sig.tolist()), engine="native", latency_frames=1),
        np.float32,
    )
    got_t = np.fromiter(DenoiseSignal(iter(sig.tolist())), np.float32)
    assert got_n.shape == got_t.shape == (11 * FRAME_SIZE,)
    assert np.abs(got_n - got_t).max() < 2e-4  # two independent engines


def test_custom_model_cross_engine(native, testing_raw):
    """JAX and native engines agree on a *non-default* model too."""
    from conftest import DATA_DIR

    from nnnoiseless_tpu import RnnModel, denoise_audio
    from nnnoiseless_tpu.model import convert_rnnoise

    data = bytes(convert_rnnoise((DATA_DIR / "sh.rnnn").read_text()))
    sig = testing_raw[: 20 * FRAME_SIZE]

    jmodel = RnnModel.from_bytes(data)
    a = denoise_audio(sig, jmodel, drop_first_frame=False).astype(np.float64)

    st = native.NativeDenoiseState(native.NativeModel(data))
    b, _ = st.process_frames(sig.reshape(20, FRAME_SIZE))
    b = b.reshape(-1).astype(np.float64)

    corr = np.sum(a * b) / np.sqrt(np.sum(a * a) * np.sum(b * b))
    assert corr > 1 - 1e-6
