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
    (c_ref, out_ref, vad_ref), (c_k, out_k, vad_k) = paths
    # f32 dense-basis DFT vs 3-pass-bf16 CT DFT: sub-0.01 i16 units
    np.testing.assert_allclose(out_k, out_ref, atol=0.01)
    np.testing.assert_allclose(vad_k, vad_ref, atol=1e-5)


def test_carries_match(paths):
    (c_ref, _, _), (c_k, _, _) = paths
    np.testing.assert_array_equal(
        np.asarray(c_k.feat.pitch_period), np.asarray(c_ref.feat.pitch_period)
    )
    np.testing.assert_allclose(
        c_k.feat.pitch_gain, c_ref.feat.pitch_gain, atol=1e-6
    )
    np.testing.assert_allclose(c_k.synthesis_mem, c_ref.synthesis_mem, atol=0.01)
    np.testing.assert_allclose(
        c_k.feat.cepstral_mem, c_ref.feat.cepstral_mem, atol=1e-5
    )
    np.testing.assert_allclose(c_k.feat.input_mem, c_ref.feat.input_mem, atol=0)
    for a, b in zip(c_k.rnn, c_ref.rnn):
        np.testing.assert_allclose(a, b, atol=1e-4)
    np.testing.assert_allclose(c_k.lastg, c_ref.lastg, atol=1e-4)
