"""Device mesh + sharding helpers: the TPU-native replacement for DDP/NCCL.

The reference distributes with one process per GPU, NCCL all-reduce inside
DDP backward, explicit ``all_reduce``/``barrier`` calls, and a
``DistributedSampler`` (reference ``3d_ldm/utils.py:55-63,188-193``,
``train_autoencoder.py:214-221``). On TPU all of that collapses into sharded
arrays over a ``jax.sharding.Mesh``: the train step is jitted with the batch
sharded on the ``data`` axis and parameters replicated, so XLA inserts the
ICI all-reduces during the backward pass automatically — there is no wrapper,
no process-group timeout, and no barrier (synchronization is implicit in the
compiled program). SyncBatchNorm is unnecessary: all norms here are
GroupNorm/InstanceNorm, which carry no cross-device statistics.

The mesh is named ('data', 'model', 'spatial') — batch, tensor-parallel
channel, and activation-depth (context) axes; the reference supports only DP
(SURVEY.md section 2.3), which maps to model=1, spatial=1.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["MeshSpec", "create_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "dp_sample_placer"]


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int = -1  # -1: all remaining devices
    model: int = 1
    spatial: int = 1  # depth-sharding (context-parallel) axis, see parallel/spatial.py
    stage: int = 1  # pipeline-parallel axis, see parallel/pipeline.py

    def resolve(self, n_devices: int) -> tuple[int, int, int, int]:
        model = max(1, self.model)
        spatial = max(1, self.spatial)
        stage = max(1, self.stage)
        data = self.data if self.data > 0 else n_devices // (model * spatial * stage)
        if data * model * spatial * stage != n_devices:
            raise ValueError(
                f"mesh {data}x{model}x{spatial}x{stage} does not tile {n_devices} devices")
        return data, model, spatial, stage


def create_mesh(spec: MeshSpec | None = None, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    spec = spec or MeshSpec()
    data, model, spatial, stage = spec.resolve(len(devices))
    # spatial/stage are the innermost (fastest-varying) axes so depth-neighbor
    # halo exchanges and stage-neighbor pipeline hops ride adjacent ICI links
    arr = np.asarray(devices).reshape(data, model, spatial, stage)
    return Mesh(arr, axis_names=("data", "model", "spatial", "stage"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def dp_sample_placer(batch: int, mesh: Optional[Mesh] = None):
    """Placement fn for data-parallel SAMPLING batches (inference/serving).

    Returns ``(place, n_shards)``: ``place`` puts an array's leading batch dim
    on the ``data`` axis so each chip denoises+decodes ``batch/n`` volumes
    (GSPMD propagates the sharding; no collectives). Falls back to identity
    (n_shards=1) when sharding isn't applicable:
      * multi-host processes address only local devices — a host-local
        ``device_put`` onto a global mesh would throw (training uses
        ``shard_batch``'s global assembly instead),
      * ``batch`` not divisible by the data-axis size,
      * a single device.
    """
    if jax.process_count() > 1:
        return (lambda x: x), 1
    if mesh is None:
        if len(jax.devices()) <= 1:
            return (lambda x: x), 1
        mesh = create_mesh(MeshSpec(data=len(jax.devices())))
    n = mesh.shape["data"]
    if n <= 1 or batch % n != 0:
        return (lambda x: x), 1
    sharding = batch_sharding(mesh)
    return (lambda x: jax.device_put(x, sharding)), n


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays) sharded on the data axis.

    Single-process: ``batch`` is the global batch, placed with device_put.
    Multi-host (pods): ``batch`` is this PROCESS's shard (what its
    BatchLoader yields) and the global array is assembled across hosts —
    see :mod:`ldm3d_tpu.parallel.multihost`.

    Pads nothing: callers must provide batch sizes divisible by the data-axis
    size (the reference enforces the same via ``drop_last=True``,
    ``utils.py:215``).
    """
    if jax.process_count() > 1:
        from ldm3d_tpu.parallel.multihost import global_batch

        return global_batch(mesh, batch)
    sharding = batch_sharding(mesh)

    def _put(x):
        n = mesh.shape["data"]
        if x.shape[0] % n != 0:
            raise ValueError(f"global batch {x.shape[0]} not divisible by data axis {n}")
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)
