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
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn: Callable, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        import jax.numpy as jnp

        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx, apply_fn=apply_fn)

    def apply_gradients(self, grads: Any) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)
