"""CLI integration tests (reference tests/cli.rs + the nnnoiseless.rs paths).

Covers: raw-input basic usage, invalid WAV rejection (by extension and by
forced --wav-in), 16-bit / float / stereo WAV inputs, non-48 kHz input
resampling, and --model with a converted rnnoise-nu text model.
"""

import wave

import numpy as np
import pytest

from conftest import DATA_DIR

from nnnoiseless_tpu.cli import main as cli_main
from nnnoiseless_tpu.tools.corr import main as corr_main


def test_basic_usage_raw(tmp_path):
    """Zero raw input denoises to a same-length raw output (tests/cli.rs:6-17)."""
    inp = tmp_path / "in.raw"
    out = tmp_path / "out.raw"
    inp.write_bytes(b"\x00" * 4800)
    assert cli_main([str(inp), str(out)]) == 0
    assert out.exists()
    got = np.fromfile(out, dtype="<i2")
    # 4800 B = 2400 samples = 5 frames; first output frame is dropped.
    assert len(got) == 4 * 480
    np.testing.assert_array_equal(got, 0)


def test_invalid_wav_rejected(tmp_path, capsys):
    """Non-WAV bytes with .wav extension must fail (tests/cli.rs:19-41)."""
    inp = tmp_path / "in.wav"
    out = tmp_path / "out.raw"
    inp.write_bytes(b"this is not really a wav file")
    assert cli_main([str(inp), str(out)]) != 0
    assert "failed to read" in capsys.readouterr().err
    # ... and equally when forced via --wav-in on a non-.wav name.
    inp2 = tmp_path / "in.bin"
    inp2.write_bytes(b"this is not really a wav file")
    assert cli_main([str(inp2), str(out), "--wav-in"]) != 0


@pytest.mark.parametrize("name", ["mono.wav", "mono-float.wav", "stereo.wav"])
def test_wav_inputs(tmp_path, name):
    """16-bit, float and stereo WAV paths produce 48 kHz 16-bit WAV output."""
    out = tmp_path / "out.wav"
    assert cli_main([str(DATA_DIR / name), str(out)]) == 0
    with wave.open(str(out), "rb") as w:
        assert w.getframerate() == 48_000
        assert w.getsampwidth() == 2
        want_channels = 2 if name == "stereo.wav" else 1
        assert w.getnchannels() == want_channels
        assert w.getnframes() > 0


def test_float_wav_matches_int_wav(tmp_path):
    """mono-float.wav is the float encoding of mono.wav; outputs must agree."""
    out_i = tmp_path / "int.raw"
    out_f = tmp_path / "float.raw"
    assert cli_main([str(DATA_DIR / "mono.wav"), str(out_i)]) == 0
    assert cli_main([str(DATA_DIR / "mono-float.wav"), str(out_f)]) == 0
    a = np.fromfile(out_i, dtype="<i2").astype(np.float64)
    b = np.fromfile(out_f, dtype="<i2").astype(np.float64)
    n = min(len(a), len(b))
    corr = np.sum(a[:n] * b[:n]) / np.sqrt(np.sum(a[:n] ** 2) * np.sum(b[:n] ** 2))
    assert corr > 1 - 1e-4


def test_resampled_input(tmp_path):
    """A 24 kHz sine comes out as 48 kHz audio of ~2x the sample count."""
    rate = 24_000
    t = np.arange(rate) / rate  # 1 s
    sig = (np.sin(2 * np.pi * 440 * t) * 8000).astype("<i2")
    inp = tmp_path / "in24k.wav"
    with wave.open(str(inp), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(sig.tobytes())
    out = tmp_path / "out.wav"
    assert cli_main([str(inp), str(out)]) == 0
    with wave.open(str(out), "rb") as w:
        assert w.getframerate() == 48_000
        # 1 s of audio -> ~100 frames out (minus the dropped first frame)
        assert abs(w.getnframes() - 99 * 480) <= 480


def test_custom_model_from_converted_rnnoise(tmp_path):
    """sh.rnnn (rnnoise-nu text model) converts and runs via --model."""
    from nnnoiseless_tpu.model import convert_rnnoise

    data = convert_rnnoise((DATA_DIR / "sh.rnnn").read_text())
    model_path = tmp_path / "sh.rnn"
    model_path.write_bytes(data)
    inp = tmp_path / "in.raw"
    out = tmp_path / "out.raw"
    rng = np.random.RandomState(0)
    (rng.randn(2400) * 1000).astype("<i2").tofile(inp)
    assert cli_main([str(inp), str(out), "--model", str(model_path)]) == 0
    assert out.exists() and out.stat().st_size == 4 * 480 * 2


def test_corr_tool(tmp_path):
    """The parity tool passes identical files and fails different ones."""
    a = tmp_path / "a.raw"
    b = tmp_path / "b.raw"
    rng = np.random.RandomState(0)
    sig = (rng.randn(1000) * 1000).astype("<i2")
    sig.tofile(a)
    sig.tofile(b)
    assert corr_main([str(a), str(b)]) == 0
    (sig[::-1].copy()).tofile(b)
    assert corr_main([str(a), str(b)]) == 1


def test_profile_sine_bench_smoke():
    """The profiling harness runs and reports sane stats (benches/sin.rs
    analogue: 1 s of 440 Hz sine through a fresh state)."""
    from nnnoiseless_tpu.tools.profile import sine_bench, sine_signal

    sig = sine_signal(0.2)
    assert sig.shape == (9600,) and np.max(np.abs(sig)) <= 16000
    stats = sine_bench(batch=2, seconds=0.2)
    assert stats["batch"] == 2 and stats["frames"] == 20
    assert stats["frames_per_sec"] > 0
    assert stats["realtime_factor"] > 0


def test_native_engine_cli(tmp_path):
    """--engine native produces golden-quality output from the CLI."""
    out = tmp_path / "out.raw"
    rc = cli_main([str(DATA_DIR / "testing.raw"), str(out), "--engine", "native"])
    assert rc == 0
    got = np.fromfile(out, dtype="<i2").astype(np.float64)
    ref = np.fromfile(DATA_DIR / "reference_output.raw", dtype="<i2").astype(np.float64)
    n = min(len(got), len(ref))
    err = np.sum((ref[:n] - got[:n]) ** 2) / np.sum(got[:n] ** 2)
    assert err < 1e-4


def test_bad_model_clean_error(tmp_path, capsys):
    out = tmp_path / "out.raw"
    inp = tmp_path / "in.raw"
    inp.write_bytes(b"\x00" * 4800)
    bad = tmp_path / "bad.rnn"
    bad.write_bytes(b"not a model at all")
    assert cli_main([str(inp), str(out), "--model", str(bad)]) == 1
    assert "failed to load model" in capsys.readouterr().err
    assert (
        cli_main([str(inp), str(out), "--model", str(bad), "--engine", "native"]) == 1
    )
