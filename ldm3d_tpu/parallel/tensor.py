"""Tensor (weight) parallelism over the mesh's ``model`` axis — GSPMD style.

Unlike the manual-collective spatial axis (:mod:`ldm3d_tpu.parallel.spatial`),
tensor parallelism here is expressed the idiomatic XLA way: parameters get
:class:`~jax.sharding.NamedSharding` annotations that split their channel
dimensions across the ``model`` axis, and the SPMD partitioner propagates the
shardings through the jitted program, inserting the all-reduces itself
(Megatron's column/row split falls out of propagation; nothing in the model
code changes). This keeps per-device weight + optimizer memory at ``1/m`` —
the role ZeRO/FSDP plays in the reference's "future ideas" list
(reference ``README_MULTIGPU.md:200-204``; never implemented there).

Rules (see :func:`tp_spec_for`):
  * conv kernels ``(kd, kh, kw, in, out)`` shard ``out`` (axis -1);
  * dense kernels ``(in, out)`` shard ``out``;
  * the UNet's zero-init output conv and anything not divisible by the axis
    size stays replicated;
  * biases/scales stay replicated (small).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tp_spec_for", "shard_params_tp", "tp_sharding_tree", "shard_train_state_tp"]

MODEL_AXIS = "model"


# don't split narrow output dims by default: a tiny per-device shard wastes
# the 128-lane MXU width and trades it for collectives — this is also what
# keeps the UNet's 16-channel zero-init output conv (and the VAE's quant
# convs) replicated, as the module rules above state
_MIN_SHARD_CHANNELS = 16


def tp_spec_for(path: tuple, arr, axis_size: int,
                min_shard_channels: int = _MIN_SHARD_CHANNELS) -> P:
    """PartitionSpec for one parameter: shard the output-channel dim on
    ``model`` when it tiles (at least ``min_shard_channels`` per device),
    else replicate."""
    if (arr.ndim >= 2 and arr.shape[-1] % axis_size == 0
            and arr.shape[-1] // axis_size >= min_shard_channels):
        # conv (kd,kh,kw,in,out) and dense (in,out): split out-channels
        return P(*([None] * (arr.ndim - 1) + [MODEL_AXIS]))
    return P()


def tp_sharding_tree(params, mesh: Mesh,
                     min_shard_channels: int = _MIN_SHARD_CHANNELS):
    """NamedSharding tree for a param pytree under ``mesh`` (model axis)."""
    m = mesh.shape[MODEL_AXIS]

    def _one(path, arr):
        return NamedSharding(mesh, tp_spec_for(path, arr, m, min_shard_channels))

    return jax.tree_util.tree_map_with_path(_one, params)


def shard_params_tp(params, mesh: Mesh):
    """Place ``params`` with output-channel dims sharded over ``model``.

    Use with a jitted step/sampler: once inputs carry these shardings, the
    SPMD partitioner propagates them through every matmul/conv and inserts
    the collectives (no shard_map, no manual psum). Works combined with the
    ``data`` axis (DP) in the same mesh.
    """
    return jax.tree_util.tree_map(
        lambda arr, sh: jax.device_put(arr, sh), params, tp_sharding_tree(params, mesh)
    )


def shard_train_state_tp(state, mesh: Mesh):
    """TP-place a TrainState: params AND optimizer moments (shapes mirror the
    params, so the same shape-based rule applies — per-device optimizer memory
    also drops to 1/m, the ZeRO-style win)."""
    return state.replace(
        params=shard_params_tp(state.params, mesh),
        opt_state=shard_params_tp(state.opt_state, mesh),
    )
