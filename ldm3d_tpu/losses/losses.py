"""Stage-1 / stage-2 loss functions (pure JAX, fp32 accumulation).

Parity targets:
  * L1/L2 recon — torch ``L1Loss``/``MSELoss`` (reference ``train_autoencoder.py:226-233``)
  * KL — the reference's guarded KL (``3d_ldm/utils.py:249-262``): per-sample
    sum over latent dims, divided by batch, clamped to [0, 1000]. The clamp is
    kept as an *option* for exact parity, but bf16-stable fp32 accumulation
    makes it unnecessary (north star: no NaN guards).
  * LSGAN patch-adversarial — ``monai.losses.PatchAdversarialLoss(criterion=
    "least_squares")`` with the ``target_is_real`` / ``for_discriminator``
    switches (reference ``train_autoencoder.py:235,411,460-462``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "l1_loss",
    "l2_loss",
    "kl_loss",
    "kl_loss_sum",
    "l1_loss_sum",
    "l2_loss_sum",
    "lsgan_generator_loss",
    "lsgan_discriminator_loss",
]


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def l2_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(diff * diff)


def kl_loss(z_mu: jax.Array, z_sigma: jax.Array, clamp: bool = False) -> jax.Array:
    """KL(q(z|x) || N(0, I)), mean over batch of per-sample sums.

    Matches the reference formula (``utils.py:255-262``); ``clamp=True``
    reproduces its [0, 1000] clamp exactly.
    """
    mu = z_mu.astype(jnp.float32)
    sigma = jnp.maximum(z_sigma.astype(jnp.float32), 1e-8)
    per_sample = 0.5 * jnp.sum(
        mu**2 + sigma**2 - jnp.log(sigma**2 + 1e-8) - 1.0,
        axis=tuple(range(1, mu.ndim)),
    )
    loss = jnp.mean(per_sample)
    if clamp:
        loss = jnp.clip(loss, 0.0, 1000.0)
    return loss


def kl_loss_sum(z_mu: jax.Array, z_sigma: jax.Array) -> jax.Array:
    """Shard-local KL SUM, elementwise-identical to :func:`kl_loss`.

    For depth-sharded paths that divide by the global batch and psum: using
    one formula in both places keeps --spatial and unsharded runs reporting
    the same kl_loss and producing the same KL gradients (an inlined
    ``-2*log(sigma)`` variant diverged near the sigma clamp floor)."""
    mu = z_mu.astype(jnp.float32)
    sigma = jnp.maximum(z_sigma.astype(jnp.float32), 1e-8)
    return 0.5 * jnp.sum(mu**2 + sigma**2 - jnp.log(sigma**2 + 1e-8) - 1.0)


def l1_loss_sum(a: jax.Array, b: jax.Array) -> jax.Array:
    """Shard-local fp32 L1 SUM (divide by the global count and psum —
    the depth-sharded analog of :func:`l1_loss`, shared by the spatial
    train and eval steps so their formulas cannot drift)."""
    return jnp.sum(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def l2_loss_sum(a: jax.Array, b: jax.Array) -> jax.Array:
    """Shard-local fp32 squared-error SUM (see :func:`l1_loss_sum`)."""
    return jnp.sum((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


def _lsq(logits: jax.Array, target: float) -> jax.Array:
    l32 = logits.astype(jnp.float32)
    return jnp.mean((l32 - target) ** 2)


def lsgan_generator_loss(logits_fake: jax.Array) -> jax.Array:
    """Generator wants fakes judged real: (D(G(x)) - 1)^2."""
    return _lsq(logits_fake, 1.0)


def lsgan_discriminator_loss(logits_fake: jax.Array, logits_real: jax.Array) -> jax.Array:
    """0.5 * [(D(fake))^2 + (D(real) - 1)^2] — reference ``train_autoencoder.py:459-470``."""
    return 0.5 * (_lsq(logits_fake, 0.0) + _lsq(logits_real, 1.0))
