"""Model parser / serializer / converter tests (reference rnn.rs:96-240)."""

import numpy as np
import pytest

from nnnoiseless_tpu.model import (
    ModelParseError,
    RnnModel,
    convert_rnnoise,
    quantize_weights,
)

from conftest import DATA_DIR


def test_default_model_shapes(default_model):
    m = default_model
    assert m.params["input_dense"]["w"].shape == (42, 24)
    assert m.params["vad_gru"]["wi"].shape == (24, 72)
    assert m.params["noise_gru"]["wi"].shape == (90, 144)
    assert m.params["denoise_gru"]["wi"].shape == (114, 288)
    assert m.params["denoise_output"]["w"].shape == (96, 22)
    assert m.params["vad_output"]["w"].shape == (24, 1)
    # weights are integer-valued int8 range
    for layer in m.params.values():
        for arr in layer.values():
            assert arr.min() >= -128 and arr.max() <= 127
            assert np.array_equal(arr, np.round(arr))


def test_roundtrip_exact(default_model):
    data = (DATA_DIR.parent.parent / "nnnoiseless_tpu/assets/weights.rnn").read_bytes()
    assert default_model.to_bytes() == data
    assert len(data) == 87521


def test_invalid_models():
    assert RnnModel.try_from_bytes(b"") is None
    assert RnnModel.try_from_bytes(b"\x01\x02") is None
    # truncated after a valid header
    assert RnnModel.try_from_bytes(bytes([42, 24, 0, 1, 2, 3])) is None
    # bad activation
    assert RnnModel.try_from_bytes(bytes([42, 24, 7]) + b"\x00" * 2000) is None
    with pytest.raises(ModelParseError):
        RnnModel.from_bytes(b"junk")
    # trailing garbage after a valid model
    good = (DATA_DIR.parent.parent / "nnnoiseless_tpu/assets/weights.rnn").read_bytes()
    assert RnnModel.try_from_bytes(good + b"\x00") is None


def test_convert_rnnoise_text_model():
    text = (DATA_DIR / "sh.rnnn").read_text()
    data = convert_rnnoise(text)
    m = RnnModel.from_bytes(data)
    assert m.meta.input_dense.nb_inputs == 42
    assert m.meta.denoise_output.nb_neurons == 22
    with pytest.raises(ModelParseError):
        convert_rnnoise("not a model\n1 2 3")


def test_quantize_weights():
    w = np.array([0.0, 0.4999, -0.4999, 1.0, -1.0, 0.001953125])
    q = quantize_weights(w)
    assert q.dtype == np.int8
    # round(256*0.4999)=128 -> clipped to 127; -128 is in-range; 0.5 rounds
    # half-even to 0.
    np.testing.assert_array_equal(q, [0, 127, -128, 127, -128, 0])
