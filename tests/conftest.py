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
