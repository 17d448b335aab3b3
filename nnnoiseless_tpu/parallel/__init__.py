"""Multi-chip scaling: shard the stream axis over a device mesh."""

from .mesh import make_mesh, shard_batch, sharded_process_frames  # noqa: F401
