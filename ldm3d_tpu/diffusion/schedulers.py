"""Noise schedulers (DDPM + DDIM) as functional, jit-crossable pytrees.

Capability parity with ``monai.networks.schedulers.DDPMScheduler`` configured
as in the reference (``train_diffusion.py:140-145``: ``num_train_timesteps=
1000, schedule="scaled_linear_beta", beta_start=0.0015, beta_end=0.0195``),
providing ``add_noise`` / ``step`` / ``timesteps``. All tables are precomputed
jnp arrays so a full reverse loop compiles into a single ``lax.scan`` XLA
program (the reference instead steps 1000 UNet calls from Python,
``inference.py:91-99``).

DDIM is an addition over the reference (which has no fast-sampling path); it
is the north-star benchmark sampler (BASELINE.md: DDIM-50 @ 96 cubed).
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["DDPMScheduler", "DDIMScheduler", "make_betas"]

Schedule = Literal["linear_beta", "scaled_linear_beta", "cosine"]
Prediction = Literal["epsilon", "sample", "v_prediction"]


def make_betas(num_train_timesteps: int, schedule: str, beta_start: float, beta_end: float) -> jnp.ndarray:
    if schedule == "linear_beta":
        return jnp.linspace(beta_start, beta_end, num_train_timesteps, dtype=jnp.float32)
    if schedule == "scaled_linear_beta":
        return jnp.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=jnp.float32) ** 2
    if schedule == "cosine":
        s = 0.008
        steps = jnp.arange(num_train_timesteps + 1, dtype=jnp.float32) / num_train_timesteps
        f = jnp.cos((steps + s) / (1 + s) * jnp.pi / 2) ** 2
        alphas_bar = f / f[0]
        betas = 1.0 - alphas_bar[1:] / alphas_bar[:-1]
        return jnp.clip(betas, 0.0, 0.999)
    raise ValueError(f"unknown beta schedule {schedule!r}")


def _pred_x0_and_eps(pred: jax.Array, x_t: jax.Array, a_t: jax.Array, prediction_type: str):
    """Convert a model output into (x0_hat, eps_hat) given alpha_bar_t."""
    sqrt_a = jnp.sqrt(a_t)
    sqrt_1ma = jnp.sqrt(1.0 - a_t)
    if prediction_type == "epsilon":
        eps = pred
        x0 = (x_t - sqrt_1ma * eps) / sqrt_a
    elif prediction_type == "sample":
        x0 = pred
        eps = (x_t - sqrt_a * x0) / sqrt_1ma
    elif prediction_type == "v_prediction":
        x0 = sqrt_a * x_t - sqrt_1ma * pred
        eps = sqrt_a * pred + sqrt_1ma * x_t
    else:
        raise ValueError(f"unknown prediction_type {prediction_type!r}")
    return x0, eps


@struct.dataclass
class DDPMScheduler:
    """Ancestral DDPM sampler/noiser. Static config lives in pytree aux data."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)
    prediction_type: str = struct.field(pytree_node=False, default="epsilon")
    clip_sample: bool = struct.field(pytree_node=False, default=True)
    clip_range: float = struct.field(pytree_node=False, default=1.0)

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        schedule: str = "scaled_linear_beta",
        beta_start: float = 0.0015,
        beta_end: float = 0.0195,
        prediction_type: str = "epsilon",
        clip_sample: bool = True,
        clip_range: float = 1.0,
    ) -> "DDPMScheduler":
        betas = make_betas(num_train_timesteps, schedule, beta_start, beta_end)
        alphas_cumprod = jnp.cumprod(1.0 - betas)
        return cls(
            betas=betas,
            alphas_cumprod=alphas_cumprod,
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
            clip_sample=clip_sample,
            clip_range=clip_range,
        )

    @property
    def timesteps(self) -> jnp.ndarray:
        """Descending training timesteps for the full reverse loop."""
        return jnp.arange(self.num_train_timesteps - 1, -1, -1, dtype=jnp.int32)

    def _bcast(self, table: jax.Array, t: jax.Array, like: jax.Array) -> jax.Array:
        v = jnp.take(table, t)
        return v.reshape(v.shape + (1,) * (like.ndim - v.ndim)).astype(like.dtype)

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """q(x_t | x_0): supports per-sample timesteps ``t`` of shape (B,)."""
        a = self._bcast(self.alphas_cumprod, t, x0)
        return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

    def velocity(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """Target for v-prediction training."""
        a = self._bcast(self.alphas_cumprod, t, x0)
        return jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * x0

    def step(self, model_output: jax.Array, t: jax.Array, x_t: jax.Array, rng: jax.Array) -> jax.Array:
        """One reverse step x_t -> x_{t-1} (scalar traced timestep ``t``)."""
        x32 = x_t.astype(jnp.float32)
        pred = model_output.astype(jnp.float32)
        a_t = jnp.take(self.alphas_cumprod, t)
        a_prev = jnp.where(t > 0, jnp.take(self.alphas_cumprod, jnp.maximum(t - 1, 0)), 1.0)
        beta_t = jnp.take(self.betas, t)
        alpha_t = 1.0 - beta_t

        x0, _ = _pred_x0_and_eps(pred, x32, a_t, self.prediction_type)
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_range, self.clip_range)

        coef_x0 = jnp.sqrt(a_prev) * beta_t / (1.0 - a_t)
        coef_xt = jnp.sqrt(alpha_t) * (1.0 - a_prev) / (1.0 - a_t)
        mean = coef_x0 * x0 + coef_xt * x32

        var = jnp.clip((1.0 - a_prev) / (1.0 - a_t) * beta_t, 1e-20)
        z = jax.random.normal(rng, x_t.shape, dtype=jnp.float32)
        sample = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * z
        return sample.astype(x_t.dtype)


@struct.dataclass
class DDIMScheduler:
    """Deterministic (eta=0 default) DDIM over a strided timestep subsequence."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)
    num_inference_steps: int = struct.field(pytree_node=False, default=50)
    prediction_type: str = struct.field(pytree_node=False, default="epsilon")
    clip_sample: bool = struct.field(pytree_node=False, default=True)
    clip_range: float = struct.field(pytree_node=False, default=1.0)
    eta: float = struct.field(pytree_node=False, default=0.0)

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        schedule: str = "scaled_linear_beta",
        beta_start: float = 0.0015,
        beta_end: float = 0.0195,
        num_inference_steps: int = 50,
        prediction_type: str = "epsilon",
        clip_sample: bool = True,
        clip_range: float = 1.0,
        eta: float = 0.0,
    ) -> "DDIMScheduler":
        betas = make_betas(num_train_timesteps, schedule, beta_start, beta_end)
        return cls(
            betas=betas,
            alphas_cumprod=jnp.cumprod(1.0 - betas),
            num_train_timesteps=num_train_timesteps,
            num_inference_steps=num_inference_steps,
            prediction_type=prediction_type,
            clip_sample=clip_sample,
            clip_range=clip_range,
            eta=eta,
        )

    @property
    def timesteps(self) -> jnp.ndarray:
        stride = self.num_train_timesteps // self.num_inference_steps
        return (jnp.arange(self.num_inference_steps - 1, -1, -1, dtype=jnp.int32)) * stride

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        a = jnp.take(self.alphas_cumprod, t)
        a = a.reshape(a.shape + (1,) * (x0.ndim - a.ndim)).astype(x0.dtype)
        return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

    def step(self, model_output: jax.Array, t: jax.Array, x_t: jax.Array, rng: jax.Array) -> jax.Array:
        stride = self.num_train_timesteps // self.num_inference_steps
        x32 = x_t.astype(jnp.float32)
        pred = model_output.astype(jnp.float32)
        a_t = jnp.take(self.alphas_cumprod, t)
        t_prev = t - stride
        a_prev = jnp.where(t_prev >= 0, jnp.take(self.alphas_cumprod, jnp.maximum(t_prev, 0)), 1.0)

        x0, eps = _pred_x0_and_eps(pred, x32, a_t, self.prediction_type)
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_range, self.clip_range)
            eps = (x32 - jnp.sqrt(a_t) * x0) / jnp.sqrt(1.0 - a_t)

        sigma = self.eta * jnp.sqrt(jnp.clip((1 - a_prev) / (1 - a_t), 1e-20) * (1 - a_t / a_prev))
        dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev - sigma**2, 0.0)) * eps
        sample = jnp.sqrt(a_prev) * x0 + dir_xt
        if self.eta > 0:
            z = jax.random.normal(rng, x_t.shape, dtype=jnp.float32)
            sample = sample + jnp.where(t_prev >= 0, sigma, 0.0) * z
        return sample.astype(x_t.dtype)
