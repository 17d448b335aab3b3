"""Device-mesh data parallelism for the denoise engine.

The workload is embarrassingly parallel across streams (the reference's only
concurrency axis is one DenoiseState per channel, src/signal.rs:42-44 /
src/nnnoiseless.rs:305).  The TPU-native mapping:

* a 1-D ``Mesh`` over all chips with axis ``"dp"``;
* the stream/batch axis of frames and of every carry leaf is sharded over
  ``dp`` (NamedSharding ``P("dp")``), model weights are replicated;
* there are **zero collectives on the hot path** — streams never couple —
  so scaling over ICI is linear by construction; XLA only inserts the
  initial broadcast of the (87 KB) weights.

Training (training/train.py) reuses the same mesh with a ``psum`` over
gradients — the standard DP pattern.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..model import ModelMeta, RnnModel


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "dp") -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(tree, mesh: Mesh, axis_name: str = "dp"):
    """Place every leaf of a batched pytree with its leading axis sharded.

    Every leaf must carry the batch as its leading axis; 0-d leaves cannot
    be sharded and are rejected explicitly.
    """
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if jnp.ndim(leaf) == 0:
            raise ValueError(
                f"leaf {jax.tree_util.keystr(path)} is 0-d and cannot carry "
                f"a sharded batch axis; batch it (shape (B, ...)) first"
            )
        if leaf.shape[0] % mesh.devices.size != 0:
            raise ValueError(
                f"stream batch {leaf.shape[0]} of leaf "
                f"{jax.tree_util.keystr(path)} must be divisible by the mesh "
                f"size {mesh.devices.size}; pad with silent streams or resize"
            )
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(2,))
def _sharded_chunk_one(params, meta: ModelMeta, carry, frames):
    from ..denoise import _scan_batch

    return _scan_batch(params, meta, carry, frames)


@functools.partial(jax.jit, static_argnums=(1, 4, 5), donate_argnums=(2,))
def _scan_shardmap_jit(
    params, meta: ModelMeta, carry, frames, mesh: Mesh, axis_name: str
):
    """The scan-path engine under ``shard_map`` over the dp axis.

    On non-CPU backends ``_scan_batch``'s precompute still contains Pallas
    kernels (the fused pitch-analysis kernel and candidates_pallas) even
    when the frame-loop kernel is disabled (NNT_FUSED=0/NNT_TWO_PHASE=0),
    and GSPMD cannot auto-partition ``pallas_call`` — so on a multi-device
    mesh the whole program runs per shard, like the two-phase path."""
    from ..denoise import _scan_batch

    def local(p, c, fr):
        return _scan_batch(p, meta, c, fr)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P(axis_name)),
        check_vma=False,
    )(params, carry, frames)


@functools.partial(jax.jit, static_argnums=(1, 4, 5, 6), donate_argnums=(3,))
def _fused_shardmap_jit(
    params, meta: ModelMeta, carry, pre, mesh: Mesh, axis_name: str,
    interpret: bool,
):
    """The fused frame-loop kernel under ``shard_map`` over the dp axis.

    Pallas/Mosaic kernels are not auto-partitionable under GSPMD, so on a
    multi-device mesh the ``pallas_call`` must run per shard: each device
    executes the kernel on its local slice of the stream batch (streams
    never couple — zero collectives).  FramePre fields are TIME-major
    (T, B, ...), hence the P(None, dp) specs."""
    from ..ops.frame_kernel import run_fused_scan

    def local(p, c, pr):
        return run_fused_scan(p, meta, c, pr, interpret=interpret)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(None, axis_name)),
        out_specs=(P(axis_name), P(axis_name), P(axis_name)),
        check_vma=False,
    )(params, carry, pre)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _precompute_shardmap_jit(input_mem, hp_mem, frames, mesh: Mesh, axis_name: str):
    """The chunk precompute under ``shard_map`` over the dp axis.

    On non-CPU backends the precompute contains Pallas kernels (the fused
    pitch-analysis kernel, ops/pitch_kernel.py), which are not
    auto-partitionable under GSPMD — each device must run the program on
    its local batch shard.  Streams never couple, so specs are pure dp
    shards (FramePre fields are TIME-major: P(None, dp))."""
    from ..chunk import precompute_chunk
    from ..pipeline import FramePre

    def local(im, hm, fr):
        return precompute_chunk(im, hm, fr, False)

    dp = P(axis_name)
    tdp = P(None, axis_name)
    pre_specs = FramePre(
        filtered=tdp, x=None, ex=None, silence=None, ceps=None, cand=tdp
    )
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(dp, dp, dp),
        out_specs=(pre_specs, dp),
        check_vma=False,
    )(input_mem, hp_mem, frames)


def _two_phase_sharded(
    params, meta: ModelMeta, carry, frames, mesh: Mesh, axis_name: str = "dp"
):
    """Two-phase engine on a multi-device mesh: BOTH phases contain Pallas
    kernels, so both run per shard via shard_map (GSPMD cannot partition
    pallas_call; see _precompute_shardmap_jit / _fused_shardmap_jit)."""
    pre, hp_out = _precompute_shardmap_jit(
        carry.feat.input_mem, carry.feat.hp_mem, frames, mesh, axis_name
    )
    interpret = jax.default_backend() == "cpu"
    carry2, out, vad = _fused_shardmap_jit(
        params, meta, carry, pre, mesh, axis_name, interpret
    )
    carry2 = carry2._replace(feat=carry2.feat._replace(hp_mem=hp_out))
    return carry2, out, vad


def _sharded_chunk(
    params, meta: ModelMeta, carry, frames,
    mesh: Optional[Mesh] = None, axis_name: str = "dp",
):
    """Identical math to denoise._process_chunk_batch; sharding comes from
    the operand placements (GSPMD propagates the batch sharding through the
    scan), so the same programs serve any mesh.  On TPU this dispatches the
    two-phase path (precompute program + fused-kernel program — compiling
    them together degrades both, see denoise._two_phase_chunk); on a
    multi-device mesh the kernel phase rides shard_map."""
    from ..denoise import _two_phase_chunk, two_phase_available

    if two_phase_available(meta, frames):
        if mesh is not None and mesh.devices.size > 1:
            return _two_phase_sharded(params, meta, carry, frames, mesh, axis_name)
        return _two_phase_chunk(params, meta, carry, frames)
    if (
        mesh is not None
        and mesh.devices.size > 1
        and jax.default_backend() != "cpu"
    ):
        # escape-hatch path on a real multi-device mesh: the scan engine
        # still contains Pallas kernels, so it must ride shard_map too
        return _scan_shardmap_jit(params, meta, carry, frames, mesh, axis_name)
    return _sharded_chunk_one(params, meta, carry, frames)


def sharded_process_frames(
    model: RnnModel, carry, frames, mesh: Optional[Mesh] = None, axis_name: str = "dp"
):
    """Run a batched chunk with the stream axis sharded over the mesh.

    ``frames`` is (B, T, 480) with B divisible by the mesh size.  The carry
    should already be sharded (see :func:`shard_batch`); outputs come back
    with the same sharding.
    """
    mesh = mesh if mesh is not None else make_mesh(axis_name=axis_name)
    frames = jnp.asarray(frames, jnp.float32)
    n_dev = mesh.devices.size
    if frames.shape[0] % n_dev != 0:
        raise ValueError(
            f"stream batch {frames.shape[0]} must be divisible by the mesh "
            f"size {n_dev}; pad with silent streams or resize the batch"
        )
    sharding = NamedSharding(mesh, P(axis_name))
    frames = jax.device_put(frames, sharding)
    return _sharded_chunk(
        model.params, model.meta, carry, frames, mesh=mesh, axis_name=axis_name
    )
