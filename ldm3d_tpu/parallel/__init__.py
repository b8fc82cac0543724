from ldm3d_tpu.parallel.mesh import (
    MeshSpec,
    batch_sharding,
    create_mesh,
    dp_sample_placer,
    replicated_sharding,
    shard_batch,
)
from ldm3d_tpu.parallel.multihost import (
    global_batch,
    init_multihost,
    is_multihost,
)
from ldm3d_tpu.parallel.tensor import (
    shard_params_tp,
    shard_train_state_tp,
    tp_sharding_tree,
)
from ldm3d_tpu.parallel.zero import (
    shard_train_state_zero,
    zero_sharding_tree,
    zero_spec_for,
)
from ldm3d_tpu.parallel.fsdp import (
    fsdp_sharding_tree,
    shard_train_state_fsdp,
)
from ldm3d_tpu.parallel.pipeline import (
    STAGE_AXIS,
    pipeline_apply,
    pp_sharding_tree,
    shard_train_state_pp,
    split_microbatches,
)
from ldm3d_tpu.parallel.spatial import (
    SPATIAL_AXIS,
    halo_exchange,
    make_spatial_encoder,
    make_spatial_sampler,
    shard_volume,
    spatial_sharding,
    validate_spatial_divisibility,
)

__all__ = [
    "MeshSpec",
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "dp_sample_placer",
    "SPATIAL_AXIS",
    "halo_exchange",
    "make_spatial_encoder",
    "make_spatial_sampler",
    "shard_volume",
    "spatial_sharding",
    "validate_spatial_divisibility",
    "shard_params_tp",
    "shard_train_state_tp",
    "tp_sharding_tree",
    "shard_train_state_zero",
    "zero_sharding_tree",
    "zero_spec_for",
    "fsdp_sharding_tree",
    "shard_train_state_fsdp",
    "global_batch",
    "init_multihost",
    "is_multihost",
    "STAGE_AXIS",
    "pipeline_apply",
    "pp_sharding_tree",
    "shard_train_state_pp",
    "split_microbatches",
]
