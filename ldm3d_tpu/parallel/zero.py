"""ZeRO-1: shard optimizer state over the ``data`` axis — GSPMD style.

The reference lists ZeRO/FSDP sharding only as a future idea and never
implements it (reference ``README_MULTIGPU.md:200-204``; ``deepspeed`` sits
unused in ``mlops/azure/conda_env.yml:58``). Here it is real and it costs no
model-code changes: Adam's moment tensors are placed with
:class:`~jax.sharding.NamedSharding` annotations that split their largest
divisible dimension across the ``data`` axis, and a sharding-constraint hook
on :class:`~ldm3d_tpu.training.state.TrainState` pins the optimizer update to
that layout while pinning the updated parameters back to their original
(replicated, or tensor-parallel) sharding. XLA then computes each moment
update on 1/N of the tensor per device and inserts one all-gather for the
fresh parameters — the ZeRO-1 communication pattern, chosen by the
partitioner rather than hand-written.

Per-device optimizer memory drops to ~1/N on the data axis (Adam holds two
fp32 moments per parameter, so for bf16-compute/fp32-param training this
removes up to two thirds of the training-state footprint at N >= 8).

Composes with tensor parallelism: when the mesh has a ``model`` axis the
moments keep the TP split on their output-channel dim and ZeRO shards a
*different* dimension over ``data``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ldm3d_tpu.parallel.tensor import tp_spec_for

__all__ = ["zero_spec_for", "zero_sharding_tree", "shard_train_state_zero"]

DATA_AXIS = "data"


def zero_spec_for(arr, data_size: int, base: P | None = None) -> P:
    """PartitionSpec sharding ``arr``'s largest free dim over ``data``.

    ``base`` carries an existing (e.g. tensor-parallel) spec whose named dims
    are kept; ZeRO picks the largest *unnamed* dimension that tiles evenly
    over the data axis. Tensors with no such dimension (biases, scales,
    scalars) stay on the base spec — they are small.
    """
    dims = list(base) + [None] * (arr.ndim - len(base)) if base is not None else [None] * arr.ndim
    best, best_size = -1, 0
    for i, (d, name) in enumerate(zip(arr.shape, dims)):
        if name is None and d % data_size == 0 and d >= 2 * data_size and d > best_size:
            best, best_size = i, d
    if best >= 0:
        dims[best] = DATA_AXIS
    return P(*dims)


def zero_sharding_tree(tree, mesh: Mesh):
    """NamedSharding tree for optimizer-state leaves under ``mesh``.

    Shape-based: moment tensors mirror parameter shapes, so the same rule
    covers Adam's mu/nu, EMA copies, and any chained transform's buffers;
    counts and empty states replicate.
    """
    n_data = mesh.shape[DATA_AXIS]
    n_model = mesh.shape.get("model", 1)

    def _one(arr):
        base = tp_spec_for((), arr, n_model) if n_model > 1 else None
        return NamedSharding(mesh, zero_spec_for(arr, n_data, base))

    return jax.tree_util.tree_map(_one, tree)


def shard_train_state_zero(state, mesh: Mesh):
    """ZeRO-1-place a TrainState: optimizer moments sharded over ``data``.

    Parameters keep their current sharding (replicated, or TP over ``model``);
    a constraint hook pins both layouts through every ``apply_gradients`` so
    the compiled step keeps the 1/N moment layout instead of letting sharding
    propagation re-replicate it.
    """
    opt_sh = zero_sharding_tree(state.opt_state, mesh)
    opt_state = jax.tree_util.tree_map(jax.device_put, state.opt_state, opt_sh)
    def _param_sharding(a):
        # keep an existing mesh sharding (tensor parallel); anything else —
        # single-device or uncommitted arrays — pins to replicated-on-mesh
        sh = getattr(a, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh == mesh:
            return sh
        return NamedSharding(mesh, P())

    param_sh = jax.tree_util.tree_map(_param_sharding, state.params)

    def constrain(new_params, new_opt_state):
        new_params = jax.lax.with_sharding_constraint(new_params, param_sh)
        new_opt_state = jax.lax.with_sharding_constraint(new_opt_state, opt_sh)
        return new_params, new_opt_state

    return state.replace(opt_state=opt_state, constrain=constrain)
