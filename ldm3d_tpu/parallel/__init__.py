from ldm3d_tpu.parallel.mesh import (
    MeshSpec,
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "MeshSpec",
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
]
