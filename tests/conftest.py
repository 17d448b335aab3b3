"""Test config: run on CPU with 8 virtual devices (multi-chip sharding tests).

The container's sitecustomize may register a TPU PJRT plugin at interpreter
boot; backend *selection* is lazy, so forcing ``jax_platforms=cpu`` here
(before any jax computation) pins the suite to the virtual 8-device CPU
platform.  Export NNT_TEST_PLATFORM=tpu to run on real hardware instead.
"""

import os
import pathlib

import numpy as np
import pytest

_want = os.environ.get("NNT_TEST_PLATFORM", "cpu")
if _want == "cpu":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

DATA_DIR = pathlib.Path(__file__).parent / "data"

# Fast lane: `pytest -m quick` runs the numeric oracles and unit tests
# (~1 min) — the modules below avoid the expensive B=1 full-clip XLA
# compiles that dominate the 23-minute full suite.  Full suite durations
# are recorded in docs/PERFORMANCE.md's test-lane notes.
_QUICK_MODULES = {
    "test_ops",
    "test_tables",
    "test_model",
    "test_resample",
    "test_pitch_trace",
}


def pytest_collection_modifyitems(items):
    import pytest as _pytest

    for item in items:
        if item.module.__name__ in _QUICK_MODULES:
            item.add_marker(_pytest.mark.quick)


@pytest.fixture(scope="session")
def testing_raw() -> np.ndarray:
    """48 kHz mono i16 test input, as f32 (i16 range)."""
    raw = np.fromfile(DATA_DIR / "testing.raw", dtype="<i2")
    return raw.astype(np.float32)


@pytest.fixture(scope="session")
def reference_output() -> np.ndarray:
    """Golden denoised output (i16), first frame already dropped."""
    return np.fromfile(DATA_DIR / "reference_output.raw", dtype="<i2")


@pytest.fixture(scope="session")
def default_model():
    from nnnoiseless_tpu import RnnModel

    return RnnModel.default()


def on_cpu_platform() -> bool:
    import jax

    return jax.default_backend() == "cpu"


def assert_waveform_close(got, want, cpu_atol):
    """Waveform comparison that is exact-ish on CPU and decision-flip-aware
    on TPU.

    On CPU both programs are plain f32 — tight atol guards regressions.  On
    TPU, differently-compiled programs (other batch size / chunk length /
    the fused Mosaic kernel) contract matmuls with different tile reduction
    orders; a near-tie +-1 pitch-lag flip is then legitimate and propagates
    a decaying ~1-unit tail through the gain hangover / RNN state.  The
    absolute parity bars vs the reference (test_golden: rel err < 1e-4, max
    per-sample <= 3) still hold for every such program and remain the
    correctness contract; here we assert waveform-level agreement: high
    correlation, bounded outliers, small typical deviation.
    """
    got = np.asarray(got, np.float64).ravel()
    want = np.asarray(want, np.float64).ravel()
    if on_cpu_platform():
        np.testing.assert_allclose(got, want, atol=cpu_atol, rtol=1e-5)
        return
    d = np.abs(got - want)
    ref_e = np.sum(want**2)
    if ref_e > 0:
        # Same metric as the reference's cross-implementation oracle
        # (src/lib.rs:184-194, rel squared error), at 1e-3 for the SHORT
        # clips these tests use: one near-tie +-1-lag flip re-colors most
        # of a 10-frame clip through the gain hangover / RNN state
        # (measured 1.5e-4..3e-4 per flip at 10 frames on v5e; the same
        # flip rate amortizes to ~5e-7 over the 100-frame golden run,
        # which stays the tight absolute bar on every platform).
        rel = np.sum(d**2) / ref_e
        assert rel < 1e-3, f"rel squared error {rel}"
    assert d.max() <= 64.0, f"max |delta| {d.max()}"
    # A broad noise-floor regression must still fire even when short-clip
    # energy stays bounded: only a small fraction of samples may deviate
    # beyond a near-tie-flip-scale threshold (a single ±1-lag flip
    # re-colors some voiced samples, not the whole clip).
    frac = float(np.mean(d > 16.0))
    assert frac <= 0.05, f"{frac:.1%} of samples deviate by > 16 i16 units"
