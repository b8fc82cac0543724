"""LR schedules with reference-intent parity — actually wired in.

The reference *requests* ``warmup_cosine`` in its configs
(``config_train_32g.json:38``) but the scheduler never activates due to a
``hasattr``-on-dict bug (``train_autoencoder.py:51-62``, SURVEY.md 2.4.1).
We implement the schedules it intended:
  * warmup_cosine: linear 0.1 -> 1.0 over 5 epochs, then cosine to 1e-6,
  * cosine: cosine to 1e-6 over max_epochs,
  * multistep: x0.1 at epochs {100, 1000} (stage-2, ``train_diffusion.py:156``),
  * constant.
All returned as optax schedules over *steps* (epoch-granular like torch's,
via steps_per_epoch).
"""

from __future__ import annotations

import optax

__all__ = ["build_lr_schedule", "scale_lr_for_world"]


def scale_lr_for_world(lr: float, world_size: int) -> float:
    """sqrt(world) * 0.5 for multi-replica, as the reference does
    (``train_autoencoder.py:246-261``)."""
    if world_size > 1:
        return lr * (world_size**0.5) * 0.5
    return lr


def build_lr_schedule(
    name: str | None,
    base_lr: float,
    max_epochs: int,
    steps_per_epoch: int,
    warmup_epochs: int = 5,
    eta_min: float = 1e-6,
    milestones: tuple[int, ...] = (100, 1000),
    gamma: float = 0.1,
) -> optax.Schedule:
    spe = max(1, steps_per_epoch)
    if name in (None, "", "constant"):
        return optax.constant_schedule(base_lr)
    if name == "cosine":
        return optax.cosine_decay_schedule(base_lr, max(1, max_epochs * spe), alpha=eta_min / base_lr)
    if name == "warmup_cosine":
        warm = optax.linear_schedule(0.1 * base_lr, base_lr, warmup_epochs * spe)
        cos = optax.cosine_decay_schedule(
            base_lr, max(1, (max_epochs - warmup_epochs) * spe), alpha=eta_min / base_lr
        )
        return optax.join_schedules([warm, cos], [warmup_epochs * spe])
    if name == "multistep":
        boundaries = {m * spe: gamma for m in milestones}
        return optax.piecewise_constant_schedule(base_lr, boundaries)
    raise ValueError(f"unknown lr schedule {name!r}")
