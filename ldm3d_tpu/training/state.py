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
    # EMA update cadence in micro-steps: set to grad_accum under
    # optax.MultiSteps so the decay applies once per EMITTED update — on the
    # k-1 accumulation micro-steps params are unchanged, and decaying anyway
    # shortened the effective EMA horizon to decay^k (found in review)
    ema_every: int = struct.field(pytree_node=False, default=1)
    # optional hook pinning (params, opt_state) shardings through the update
    # (set by parallel.zero.shard_train_state_zero; None = let GSPMD propagate)
    constrain: Callable | None = struct.field(pytree_node=False, default=None)
    # optional hook pinning the EMA layout too: the EMA update runs AFTER
    # constrain, so without this an FSDP-sharded EMA could propagate back to
    # replicated (full per-chip copy) through the elementwise update output
    constrain_ema: Callable | None = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, apply_fn: Callable, params: Any, tx: optax.GradientTransformation,
               ema_decay: float = 0.0, ema_every: int = 1) -> "TrainState":
        import jax.numpy as jnp

        ema = jax.tree_util.tree_map(jnp.copy, params) if ema_decay > 0 else None
        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params),
                   tx=tx, apply_fn=apply_fn, ema_params=ema, ema_decay=ema_decay,
                   ema_every=max(1, ema_every))

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
            if self.ema_every > 1:
                # MultiSteps emits on the k-th micro-step (mini_step k-1 =
                # this 0-based step with (step+1) % k == 0); skip the decay
                # on pure-accumulation micro-steps
                emit = ((self.step + 1) % self.ema_every) == 0
                new_ema = jax.tree_util.tree_map(
                    lambda n, e: jax.numpy.where(emit, n, e), new_ema, self.ema_params)
            if self.constrain_ema is not None:
                new_ema = self.constrain_ema(new_ema)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state,
                            ema_params=new_ema)
