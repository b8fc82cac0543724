"""FSDP (ZeRO-3): parameters sharded at rest over the ``data`` axis.

:mod:`ldm3d_tpu.parallel.zero` (ZeRO-1) shards only the optimizer moments;
parameter memory stays fully replicated per device. FSDP shards the
parameters themselves (and the EMA copy, when enabled) the same shape-based
way: each leaf's largest free dimension splits over ``data``. Expressed as
:class:`~jax.sharding.NamedSharding` placements plus a constraint hook
through the optimizer update, the SPMD partitioner then inserts an
all-gather right before each weight's use in the forward/backward pass and a
reduce-scatter for its gradient contribution — the ZeRO-3 communication
pattern, chosen by XLA rather than hand-written (no wrapper module, no
hooks, no model-code changes; contrast torch FSDP's FlatParameter
machinery).

Memory: per-device training-state footprint (params + Adam moments + EMA)
drops to ~1/N on the data axis — the lever that fits models whose *state*
exceeds one chip's HBM even when a batch fits. Cost: one all-gather per
weight per forward/backward use, riding ICI; at this framework's conv-heavy
shapes the gathered bytes are small next to the conv FLOPs (the classic
ZeRO-3 trade).

The reference lists ZeRO/FSDP only as a future idea and never implements it
(reference ``README_MULTIGPU.md:200-204``; ``deepspeed`` sits unused in
``mlops/azure/conda_env.yml:58``). Composes with tensor parallelism exactly
like ZeRO-1: named (``model``) dims are preserved and FSDP picks a different
dimension for ``data``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from ldm3d_tpu.parallel.zero import zero_sharding_tree

__all__ = ["fsdp_sharding_tree", "shard_train_state_fsdp"]


# the placement rule is identical to ZeRO-1's (largest free dim over 'data',
# TP dims preserved, small tensors replicated) — only WHAT gets sharded
# differs: FSDP applies it to params/EMA, not just moments
fsdp_sharding_tree = zero_sharding_tree


def shard_train_state_fsdp(state, mesh: Mesh):
    """FSDP-place a TrainState: params, optimizer moments, and EMA all
    sharded over ``data``; a constraint hook pins the layouts through every
    ``apply_gradients`` so the compiled step updates 1/N of each tensor per
    device (sharding propagation would otherwise re-replicate the params
    after ``optax.apply_updates``).

    Supersedes :func:`~ldm3d_tpu.parallel.zero.shard_train_state_zero` — the
    moments are already covered here, so apply one or the other, not both.
    """
    param_sh = fsdp_sharding_tree(state.params, mesh)
    opt_sh = fsdp_sharding_tree(state.opt_state, mesh)
    params = jax.tree_util.tree_map(jax.device_put, state.params, param_sh)
    opt_state = jax.tree_util.tree_map(jax.device_put, state.opt_state, opt_sh)
    ema = state.ema_params
    constrain_ema = None
    if ema is not None:
        ema_sh = fsdp_sharding_tree(ema, mesh)
        ema = jax.tree_util.tree_map(jax.device_put, ema, ema_sh)

        # the EMA update runs AFTER the (params, opt_state) constrain hook;
        # without its own constraint the elementwise d*e + (1-d)*p output
        # could propagate back to replicated — a full per-chip EMA copy,
        # exactly the state FSDP exists to shard (found in review)
        def constrain_ema(new_ema, ema_sh=ema_sh):
            return jax.lax.with_sharding_constraint(new_ema, ema_sh)

    def constrain(new_params, new_opt_state):
        new_params = jax.lax.with_sharding_constraint(new_params, param_sh)
        new_opt_state = jax.lax.with_sharding_constraint(new_opt_state, opt_sh)
        return new_params, new_opt_state

    return state.replace(params=params, opt_state=opt_state, ema_params=ema,
                         constrain=constrain, constrain_ema=constrain_ema)
