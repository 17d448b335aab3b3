"""Multi-chip (device-mesh) data parallelism tests on the virtual 8-device
CPU platform (conftest forces --xla_force_host_platform_device_count=8).

The stream axis shards over the 1-D "dp" mesh with replicated weights and
zero hot-path collectives (SURVEY.md §2 parallelism checklist); results
must match the unsharded engine.
"""

import jax
import numpy as np
import pytest

from nnnoiseless_tpu import FRAME_SIZE, init_batch_carry, process_frames
from nnnoiseless_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    sharded_process_frames,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def test_sharded_matches_unsharded(testing_raw, default_model):
    b, t = 16, 6
    rng = np.random.RandomState(0)
    frames = np.stack(
        [
            (rng.randn(t * FRAME_SIZE) * 2000).astype(np.float32)
            for _ in range(b)
        ]
    ).reshape(b, t, FRAME_SIZE)
    frames[0] = testing_raw[: t * FRAME_SIZE].reshape(t, FRAME_SIZE)

    mesh = make_mesh(jax.devices()[:8])
    carry = shard_batch(init_batch_carry(default_model.meta, b), mesh)
    c2, out_s, vad_s = sharded_process_frames(default_model, carry, frames, mesh)

    c1 = init_batch_carry(default_model.meta, b)
    _, out_u, vad_u = process_frames(default_model, c1, frames)

    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u), atol=1.0)
    np.testing.assert_allclose(np.asarray(vad_s), np.asarray(vad_u), atol=1e-3)
    # outputs come back sharded over the mesh
    assert len(out_s.sharding.device_set) == 8


def test_sharded_carry_roundtrip(default_model):
    """Carries survive a sharded multi-chunk run (state handoff)."""
    b = 8
    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.RandomState(1)
    frames = (rng.randn(b, 4, FRAME_SIZE) * 1000).astype(np.float32)

    carry = shard_batch(init_batch_carry(default_model.meta, b), mesh)
    carry, out_a, _ = sharded_process_frames(default_model, carry, frames[:, :2], mesh)
    carry, out_b, _ = sharded_process_frames(default_model, carry, frames[:, 2:], mesh)
    two_chunk = np.concatenate([np.asarray(out_a), np.asarray(out_b)], axis=1)

    c1 = init_batch_carry(default_model.meta, b)
    _, out_full, _ = process_frames(default_model, c1, frames)
    np.testing.assert_allclose(two_chunk, np.asarray(out_full), atol=1.0)


def test_shardmap_fused_kernel_matches(testing_raw, default_model):
    """The production multi-device path runs the fused Pallas kernel under
    shard_map (Mosaic kernels are not GSPMD-auto-partitionable); validated
    here with the interpret-mode kernel on the 8-device CPU mesh against
    the unsharded scan engine."""
    from nnnoiseless_tpu.parallel.mesh import _two_phase_sharded

    b, t = 8, 4
    frames = np.stack(
        [
            testing_raw[i * FRAME_SIZE * t : (i + 1) * FRAME_SIZE * t]
            .reshape(t, FRAME_SIZE)
            for i in range(b)
        ]
    )
    mesh = make_mesh(jax.devices()[:8])
    carry = shard_batch(init_batch_carry(default_model.meta, b), mesh)
    c2, out_s, vad_s = _two_phase_sharded(
        default_model.params, default_model.meta, carry,
        shard_batch(jax.numpy.asarray(frames), mesh), mesh,
    )

    c1 = init_batch_carry(default_model.meta, b)
    _, out_u, vad_u = process_frames(default_model, c1, frames)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u), atol=0.05)
    np.testing.assert_allclose(np.asarray(vad_s), np.asarray(vad_u), atol=1e-4)
    assert len(out_s.sharding.device_set) == 8


def test_gspmd_scan_path_has_no_collectives(default_model):
    """Mechanical proof of the zero-hot-path-collectives claim (SURVEY.md §2
    parallelism checklist): compile the GSPMD scan engine on the 8-device
    mesh with dp-sharded operands and assert the optimized HLO contains no
    collective ops at all.  Streams never couple, weights are passed (not
    broadcast via a collective), so ANY collective here is a sharding
    regression — e.g. the T-major (t*b, 864) flatten this test caught, which
    made GSPMD re-materialize every pitch window with a (3, 8, 864)
    all-gather (fixed by keeping (T, B) unmerged in chunk.precompute_chunk).
    """
    import re

    from nnnoiseless_tpu.parallel.mesh import _sharded_chunk_one

    b, t = 16, 3
    mesh = make_mesh(jax.devices()[:8])
    carry = shard_batch(init_batch_carry(default_model.meta, b), mesh)
    frames = shard_batch(
        jax.numpy.zeros((b, t, FRAME_SIZE), jax.numpy.float32), mesh
    )
    compiled = _sharded_chunk_one.lower(
        default_model.params, default_model.meta, carry, frames
    ).compile()
    hlo = compiled.as_text()
    bad = re.findall(
        r"\b(all-gather|all-reduce|all-to-all|collective-permute|"
        r"reduce-scatter|collective-broadcast)\b[^\n]*",
        hlo,
    )
    assert not bad, f"hot-path collectives in the scan engine HLO: {bad[:5]}"
    # per-shard program identity: GSPMD emits ONE SPMD module for all shards
    assert len(compiled.as_text().split("ENTRY")) == 2  # single entry point
    # and every output really is dp-sharded, not silently replicated
    c2, out, vad = _sharded_chunk_one(
        default_model.params, default_model.meta, carry, frames
    )
    assert len(out.sharding.device_set) == 8


def test_indivisible_batch_raises(default_model):
    mesh = make_mesh(jax.devices()[:8])
    frames = np.zeros((6, 2, FRAME_SIZE), np.float32)  # 6 % 8 != 0
    with pytest.raises(ValueError, match="divisible"):
        shard_batch(init_batch_carry(default_model.meta, 6), mesh)
    carry = init_batch_carry(default_model.meta, 6)  # unsharded carry
    with pytest.raises(ValueError, match="divisible"):
        sharded_process_frames(default_model, carry, frames, mesh)
