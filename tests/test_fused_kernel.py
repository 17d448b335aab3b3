"""The fused frame-loop Pallas kernel must match the lax.scan path.

Runs in interpreter mode on CPU (the TPU lane exercises the compiled
kernel through the golden CLI / bench); both consume the same chunk
precompute, so this pins the kernel's in-VMEM re-implementation of the
scan body (remove_doubling selection, barrel-shift window, dense-basis
DFTs, cepstral ring, RNN, comb filter, synthesis).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nnnoiseless_tpu import FRAME_SIZE, init_batch_carry
from nnnoiseless_tpu.chunk import precompute_chunk
from nnnoiseless_tpu.denoise import _scan_batch
from nnnoiseless_tpu.ops.frame_kernel import run_fused_scan


@pytest.fixture(scope="module")
def paths(testing_raw, default_model):
    model = default_model
    b, t = 4, 8
    frames = jnp.asarray(
        np.stack(
            [
                testing_raw[i * FRAME_SIZE * t : (i + 1) * FRAME_SIZE * t].reshape(
                    t, FRAME_SIZE
                )
                for i in range(b)
            ]
        )
    )
    carry = init_batch_carry(model.meta, b)
    ref = _scan_batch(model.params, model.meta, carry, frames)
    pre, _hp = precompute_chunk(carry.feat.input_mem, carry.feat.hp_mem, frames)
    fused = run_fused_scan(
        model.params, model.meta, carry, pre, interpret=True, block=4
    )
    return ref, fused


def test_output_matches(paths):
    from conftest import assert_waveform_close, on_cpu_platform

    (c_ref, out_ref, vad_ref), (c_k, out_k, vad_k) = paths
    # CPU (interpret mode): f32 on both paths — sub-0.01 i16 units.  On
    # TPU the compiled Mosaic kernel contracts at fp32 (HIGHEST) while the
    # XLA scan path uses 3-pass bf16 — waveform-level agreement applies.
    assert_waveform_close(out_k, out_ref, cpu_atol=0.01)
    np.testing.assert_allclose(
        vad_k, vad_ref, atol=1e-5 if on_cpu_platform() else 1e-2
    )


def test_padded_batch_matches(testing_raw, default_model):
    """Batches that don't divide the kernel block are padded with zeroed
    silent streams and sliced back — every batch size rides the fused
    kernel (the reference has ONE engine for all callers, denoise.rs:95)."""
    from conftest import assert_waveform_close

    model = default_model
    b, t = 3, 4  # 3 % block(4) != 0 -> one pad stream
    frames = jnp.asarray(
        np.stack(
            [
                testing_raw[i * FRAME_SIZE * t : (i + 1) * FRAME_SIZE * t].reshape(
                    t, FRAME_SIZE
                )
                for i in range(b)
            ]
        )
    )
    carry = init_batch_carry(model.meta, b)
    c_ref, out_ref, vad_ref = _scan_batch(model.params, model.meta, carry, frames)
    pre, _hp = precompute_chunk(
        carry.feat.input_mem, carry.feat.hp_mem, frames, lag0=False
    )
    c_k, out_k, vad_k = run_fused_scan(
        model.params, model.meta, carry, pre, interpret=True, block=4
    )
    assert out_k.shape == (b, t, FRAME_SIZE) and vad_k.shape == (b, t)
    assert c_k.feat.input_mem.shape[0] == b
    assert_waveform_close(out_k, out_ref, cpu_atol=0.01)
    np.testing.assert_array_equal(
        np.asarray(c_k.feat.pitch_period), np.asarray(c_ref.feat.pitch_period)
    )


def test_carries_match(paths):
    from conftest import on_cpu_platform

    (c_ref, _, _), (c_k, _, _) = paths
    tight = on_cpu_platform()
    np.testing.assert_array_equal(
        np.asarray(c_k.feat.pitch_period), np.asarray(c_ref.feat.pitch_period)
    )
    np.testing.assert_allclose(
        c_k.feat.pitch_gain, c_ref.feat.pitch_gain,
        atol=1e-6 if tight else 1e-3,
    )
    np.testing.assert_allclose(
        c_k.synthesis_mem, c_ref.synthesis_mem, atol=0.01 if tight else 2.0
    )
    np.testing.assert_allclose(
        c_k.feat.cepstral_mem, c_ref.feat.cepstral_mem,
        atol=1e-5 if tight else 1e-2,
    )
    np.testing.assert_allclose(c_k.feat.input_mem, c_ref.feat.input_mem, atol=0)
    for a, b in zip(c_k.rnn, c_ref.rnn):
        np.testing.assert_allclose(a, b, atol=1e-4 if tight else 1e-2)
    np.testing.assert_allclose(c_k.lastg, c_ref.lastg, atol=1e-4 if tight else 1e-2)
