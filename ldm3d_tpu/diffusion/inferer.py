"""Latent diffusion inferer: training-step noising + single-program sampler.

Capability parity with ``monai.inferers.LatentDiffusionInferer`` as used by
the reference (``train_diffusion.py:152,197-205,326-333`` and
``inference.py:85,94-99``): encode -> scale -> add-noise -> (concat condition)
-> UNet for training, and the full reverse loop + VAE decode for sampling.

The TPU-native difference: the reverse loop is a ``lax.scan`` so DDPM-1000 or
DDIM-50 plus the VAE decode compile into ONE XLA program — no Python-stepped
UNet dispatch (the reference's main inference bottleneck, SURVEY.md 3.3).

Conditioning modes, fixing the reference's train/infer mismatch (SURVEY.md
2.4.3): ``condition=None`` samples unconditionally (requires a UNet with
``in_channels == latent_channels``); a ``(B, d, h, w, C_cond)`` condition is
channel-concatenated every step ("concat" mode).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["noise_prediction_inputs", "training_targets", "guided_model_pred",
           "sample_latents", "sample"]


def guided_model_pred(
    unet_apply: "Callable[[jax.Array, jax.Array], jax.Array]",
    x: jax.Array,
    t_b: jax.Array,
    condition: "Optional[jax.Array]",
    guidance_scale: float = 1.0,
) -> jax.Array:
    """Concat-conditioned model prediction with optional batched CFG.

    The ONE owner of the conditioning/guidance convention (zero-latent null
    condition; ``eps_u + w*(eps_c - eps_u)`` with the conditional and
    unconditional branches as a single 2B-batch UNet call) — the sampler
    below AND guidance distillation (:mod:`ldm3d_tpu.training.distill`) both
    route through it, so a future change (e.g. a learned null embedding)
    cannot silently diverge between sampling and distillation.
    """
    if condition is None:
        return unet_apply(x, t_b)
    cond_in = jnp.concatenate([x, condition.astype(x.dtype)], axis=-1)
    if guidance_scale == 1.0:
        return unet_apply(cond_in, t_b)
    b = x.shape[0]
    uncond_in = jnp.concatenate([x, jnp.zeros_like(condition).astype(x.dtype)], axis=-1)
    both = unet_apply(jnp.concatenate([cond_in, uncond_in], axis=0),
                      jnp.concatenate([t_b, t_b], axis=0))
    pred, pred_u = both[:b], both[b:]
    return pred_u + guidance_scale * (pred - pred_u)


def noise_prediction_inputs(
    scheduler,
    latents: jax.Array,
    noise: jax.Array,
    timesteps: jax.Array,
    condition: Optional[jax.Array] = None,
) -> jax.Array:
    """Build the UNet input for training: noisy (scaled) latents, concat-conditioned."""
    noisy = scheduler.add_noise(latents, noise, timesteps)
    if condition is not None:
        noisy = jnp.concatenate([noisy, condition.astype(noisy.dtype)], axis=-1)
    return noisy


def training_targets(scheduler, latents: jax.Array, noise: jax.Array, timesteps: jax.Array) -> jax.Array:
    """Regression target per scheduler.prediction_type (epsilon by default)."""
    if scheduler.prediction_type == "epsilon":
        return noise
    if scheduler.prediction_type == "sample":
        return latents
    if scheduler.prediction_type == "v_prediction":
        return scheduler.velocity(latents, noise, timesteps)
    raise ValueError(scheduler.prediction_type)


def sample_latents(
    unet_apply: Callable[[jax.Array, jax.Array], jax.Array],
    scheduler,
    noise: jax.Array,
    rng: jax.Array,
    condition: Optional[jax.Array] = None,
    guidance_scale: float = 1.0,
) -> jax.Array:
    """Run the full reverse loop in latent space as one ``lax.scan``.

    Args:
      unet_apply: ``(x, t) -> model_output`` (t of shape (B,)).
      scheduler: DDPM, DDIM, or DPM-Solver++ scheduler pytree.
      noise: initial latent noise ``(B, d, h, w, C)``.
      rng: PRNG key for ancestral noise (unused when sampling is deterministic).
      condition: optional concat conditioning, fixed across steps.
      guidance_scale: classifier-free guidance weight w (concat mode: the
        unconditional branch zeroes the condition channels). 1.0 disables the
        extra UNet pass; w > 1 computes ``(1+w')·eps_c − w'·eps_u`` with
        ``w' = w − 1`` — i.e. ``eps_u + w·(eps_c − eps_u)``.
    """
    batch = noise.shape[0]
    timesteps = scheduler.timesteps
    step_rngs = jax.random.split(rng, timesteps.shape[0])

    def model_pred(x, t_b):
        # batched CFG: the conditional and unconditional branches run as ONE
        # 2B-batch UNet call (same FLOPs as two B calls, better MXU
        # utilization at the small batches typical of 96^3 volumes)
        return guided_model_pred(unet_apply, x, t_b, condition, guidance_scale)

    if getattr(scheduler, "multistep", False):
        # multistep (DPM-Solver++ 2M/3M): carry the last two x0 predictions
        # (the zeros inits never contribute: c2[0] = c3[0] = c3[1] = 0)
        def body_ms(carry, scan_in):
            x, x0_prev, x0_prev2 = carry
            t, i = scan_in
            pred = model_pred(x, jnp.full((batch,), t, dtype=jnp.int32))
            x_next, x0 = scheduler.step_multistep(pred, i, t, x, x0_prev, x0_prev2)
            return (x_next, x0, x0_prev), None

        idx = jnp.arange(timesteps.shape[0], dtype=jnp.int32)
        (final, _, _), _ = jax.lax.scan(
            body_ms, (noise, jnp.zeros_like(noise), jnp.zeros_like(noise)),
            (timesteps, idx))
        return final

    def body(x, scan_in):
        t, step_rng = scan_in
        pred = model_pred(x, jnp.full((batch,), t, dtype=jnp.int32))
        x_next = scheduler.step(pred, t, x, step_rng)
        return x_next, None

    final, _ = jax.lax.scan(body, noise, (timesteps, step_rngs))
    return final


def sample(
    unet_apply: Callable[[jax.Array, jax.Array], jax.Array],
    decode_apply: Callable[[jax.Array], jax.Array],
    scheduler,
    noise: jax.Array,
    rng: jax.Array,
    condition: Optional[jax.Array] = None,
    scale_factor: float | jax.Array = 1.0,
    guidance_scale: float = 1.0,
) -> jax.Array:
    """Reverse loop + VAE decode, one compiled program.

    Mirrors ``LatentDiffusionInferer.sample`` (reference ``inference.py:94-99``):
    the final latent is divided by ``scale_factor`` before decoding.
    """
    latents = sample_latents(unet_apply, scheduler, noise, rng, condition,
                             guidance_scale=guidance_scale)
    latents = latents / jnp.asarray(scale_factor, dtype=latents.dtype)
    return decode_apply(latents)
