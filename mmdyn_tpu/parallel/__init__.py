"""Device mesh / sharding helpers (pure data-parallel over ICI, growable)."""

from mmdyn_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
