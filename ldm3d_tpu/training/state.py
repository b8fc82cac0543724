"""Train state: params + optimizer state + step + rng, one pytree.

Unlike the reference's checkpoints (bare ``state_dict`` only — optimizer
state and epoch counter are lost on resume, SURVEY.md 5.4), this state is
what gets checkpointed, so resume continues the schedule exactly.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    ema_params: Any = None  # exponential moving average of params (optional)
    ema_decay: float = struct.field(pytree_node=False, default=0.0)
    # optional hook pinning (params, opt_state) shardings through the update
    # (set by parallel.zero.shard_train_state_zero; None = let GSPMD propagate)
    constrain: Callable | None = struct.field(pytree_node=False, default=None)
    # optional hook pinning the EMA layout too: the EMA update runs AFTER
    # constrain, so without this an FSDP-sharded EMA could propagate back to
    # replicated (full per-chip copy) through the elementwise update output
    constrain_ema: Callable | None = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, apply_fn: Callable, params: Any, tx: optax.GradientTransformation,
               ema_decay: float = 0.0) -> "TrainState":
        import jax.numpy as jnp

        ema = jax.tree_util.tree_map(jnp.copy, params) if ema_decay > 0 else None
        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params),
                   tx=tx, apply_fn=apply_fn, ema_params=ema, ema_decay=ema_decay)

    def apply_gradients(self, grads: Any) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        if self.constrain is not None:
            new_params, new_opt_state = self.constrain(new_params, new_opt_state)
        new_ema = self.ema_params
        if self.ema_params is not None:
            d = self.ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p.astype(e.dtype), self.ema_params, new_params
            )
            if self.constrain_ema is not None:
                new_ema = self.constrain_ema(new_ema)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state,
                            ema_params=new_ema)
