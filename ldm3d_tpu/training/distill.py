"""Progressive distillation: halve the sampler's step count, repeatedly.

Salimans & Ho 2022 ("Progressive Distillation for Fast Sampling of Diffusion
Models"): a student (initialized from the teacher) learns to match TWO
deterministic DDIM steps of the teacher with ONE step, on a grid half as
fine. R rounds turn an N-step sampler into an N/2^R-step one — the serving
latency/throughput lever beyond fast ODE solvers (the reference has no fast
sampling at all: its only sampler is the 1000-step Python DDPM loop,
``3d_ldm/inference.py:79-99``; we add DDIM/DPM-Solver++ and this).

TPU shape: the whole distillation step — two teacher forwards, the implied
one-step target, the student forward/backward, the Adam update — is ONE
jitted program; grids come from :func:`ldm3d_tpu.diffusion.distillation_grid`
(self-similar under halving, so student grids stay aligned round over
round), and the distilled student samples through
:class:`ldm3d_tpu.diffusion.GridDDIMScheduler` in the same
``lax.scan`` sampler as every other scheduler.

Math (x0-parameterization): with alpha = sqrt(abar), sigma = sqrt(1 - abar),
a DDIM jump from state s to state s' is ``z' = alpha' x0 + sigma' eps`` with
``eps = (z - alpha x0)/sigma``. The teacher runs t -> mid -> end; the value a
ONE-step student must predict so its single jump t -> end lands on the
teacher's z_end is

    x0_target = (z_end - (sigma_end/sigma_t) x_t) / (alpha_end - (sigma_end/sigma_t) alpha_t)

(the denominator is positive: abar_end > abar_t along the reverse path).
The loss is truncated-SNR-weighted x0-space MSE: w = max(abar/(1-abar), 1).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ldm3d_tpu.diffusion.schedulers import _pred_x0_and_eps, distillation_grid
from ldm3d_tpu.training.state import TrainState

__all__ = ["DistillConfig", "make_distillation_step", "student_timesteps"]


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    teacher_steps: int  # N: the teacher's DDIM grid; the student learns N//2
    conditional: bool = True
    clamp_inputs: bool = True
    # truncated-SNR loss weight floor: w = max(SNR(t), snr_floor)
    snr_floor: float = 1.0
    # prediction type the STUDENT regresses in (None = same as the teacher's
    # scheduler). Few-step students are better behaved with "v_prediction"
    # (epsilon-parameterized x0 blows up as alpha -> 0 at high noise).
    student_prediction_type: str | None = None
    # guidance distillation (Meng et al. 2023, "On Distillation of Guided
    # Diffusion Models", fixed-w variant): the teacher's predictions run
    # classifier-free guidance at this weight, so the student BAKES the
    # guided distribution in — one UNet pass at sampling time where the
    # guided teacher needed two per step. Needs `conditional`; apply on the
    # FIRST halving round only (later rounds distill the already-guided
    # student at 1.0).
    guidance_scale: float = 1.0

    def __post_init__(self):
        if self.teacher_steps < 2 or self.teacher_steps % 2:
            raise ValueError(f"teacher_steps must be even and >= 2, got {self.teacher_steps}")
        if self.guidance_scale != 1.0 and not self.conditional:
            raise ValueError("guidance distillation needs a conditional model")


def student_timesteps(num_train_timesteps: int, teacher_steps: int) -> np.ndarray:
    """The distilled student's visited timesteps (its GridDDIM schedule):
    the even entries of the teacher grid = ``distillation_grid(T, N//2)[:-1]``."""
    return distillation_grid(num_train_timesteps, teacher_steps // 2)[:-1]


def _gather(table: jnp.ndarray, idx: jax.Array, like: jax.Array) -> jax.Array:
    """Per-sample scalar gather broadcast against a (B, ...) volume."""
    v = jnp.take(table, idx)
    return v.reshape(v.shape + (1,) * (like.ndim - 1))


def make_distillation_step(unet, ae, scheduler, cfg: DistillConfig):
    """Build the jitted one-halving distillation step.

    Returns ``step(student_state, teacher_params, ae_params, batch,
    scale_factor, rng) -> (state, metrics)`` with the same ``batch`` contract
    as the stage-2 trainer ({"image": low, "label": high} NDHWC volumes;
    conditions concat like training, reference ``train_diffusion.py:197-205``).
    ``unet`` serves both roles — the student is initialized from (and shaped
    like) the teacher; only the params differ.
    """
    teacher_pt = scheduler.prediction_type
    student_pt = cfg.student_prediction_type or teacher_pt
    abar_np = np.asarray(scheduler.alphas_cumprod, np.float32)
    grid = distillation_grid(scheduler.num_train_timesteps, cfg.teacher_steps)
    m = cfg.teacher_steps // 2
    # per student-step-j tables: visited t, teacher midpoint, and the three
    # state alpha_bars (the final jump's end state is TERMINAL abar = 1)
    t_vis = jnp.asarray(grid[0 : 2 * m : 2], jnp.int32)
    t_mid = jnp.asarray(grid[1 : 2 * m : 2], jnp.int32)
    a_t_tab = jnp.asarray(abar_np[grid[0 : 2 * m : 2]])
    a_mid_tab = jnp.asarray(abar_np[grid[1 : 2 * m : 2]])
    a_end_np = np.empty((m,), np.float32)
    a_end_np[: m - 1] = abar_np[grid[2 : 2 * m : 2]]
    a_end_np[m - 1] = 1.0
    a_end_tab = jnp.asarray(a_end_np)

    def encode(ae_params, x, rng):
        return ae.apply({"params": ae_params}, x, method="encode_stage_2_inputs",
                        rngs={"sample": rng})

    def _maybe_clip(x0):
        if scheduler.clip_sample:
            return jnp.clip(x0, -scheduler.clip_range, scheduler.clip_range)
        return x0

    def _targets(teacher_params, ae_params, batch, scale_factor, rng):
        """x_t, per-sample tables, condition, and the implied 1-step x0 target."""
        rng_zl, rng_zi, rng_n, rng_j = jax.random.split(rng, 4)
        images, labels = batch["image"], batch["label"]
        if cfg.clamp_inputs:
            images = jnp.clip(images, 0.0, 1.0)
            labels = jnp.clip(labels, 0.0, 1.0)
        z0 = encode(ae_params, labels, rng_zl).astype(jnp.float32) * scale_factor
        condition = None
        if cfg.conditional:
            condition = encode(ae_params, images, rng_zi)

        b = z0.shape[0]
        j = jax.random.randint(rng_j, (b,), 0, m)
        t = jnp.take(t_vis, j)
        a_t = _gather(a_t_tab, j, z0)
        a_mid = _gather(a_mid_tab, j, z0)
        a_end = _gather(a_end_tab, j, z0)

        eps = jax.random.normal(rng_n, z0.shape, jnp.float32)
        x_t = jnp.sqrt(a_t) * z0 + jnp.sqrt(1.0 - a_t) * eps

        def teacher_pred(z, tt):
            # guidance distillation: the teacher IS the guided model; the
            # conditioning/CFG convention is owned by inferer.guided_model_pred
            # so sampling and distillation can never silently diverge
            from ldm3d_tpu.diffusion.inferer import guided_model_pred

            def apply_fn(zz, t_):
                return unet.apply({"params": teacher_params}, zz, t_)

            return guided_model_pred(apply_fn, z.astype(unet.dtype), tt, condition,
                                     cfg.guidance_scale).astype(jnp.float32)

        # teacher: two DDIM jumps t -> mid -> end on the fine grid
        x0_1, eps_1 = _pred_x0_and_eps(teacher_pred(x_t, t), x_t, a_t, teacher_pt)
        x0_1 = _maybe_clip(x0_1)
        z_mid = jnp.sqrt(a_mid) * x0_1 + jnp.sqrt(1.0 - a_mid) * eps_1
        x0_2, eps_2 = _pred_x0_and_eps(teacher_pred(z_mid, jnp.take(t_mid, j)),
                                       z_mid, a_mid, teacher_pt)
        x0_2 = _maybe_clip(x0_2)
        z_end = jnp.sqrt(a_end) * x0_2 + jnp.sqrt(1.0 - a_end) * eps_2

        # the x0 a one-step student must predict to land on z_end
        ratio = jnp.sqrt((1.0 - a_end) / (1.0 - a_t))
        denom = jnp.sqrt(a_end) - ratio * jnp.sqrt(a_t)
        x0_tgt = (z_end - ratio * x_t) / denom

        w = jnp.maximum(a_t / (1.0 - a_t), cfg.snr_floor)
        return x_t, t, a_t, condition, jax.lax.stop_gradient(x0_tgt), w

    def loss_fn(student_params, x_t, t, a_t, condition, x0_tgt, w):
        zin = x_t.astype(unet.dtype)
        if condition is not None:
            zin = jnp.concatenate([zin, condition.astype(zin.dtype)], axis=-1)
        pred = unet.apply({"params": student_params}, zin, t).astype(jnp.float32)
        x0_s, _ = _pred_x0_and_eps(pred, x_t, a_t, student_pt)
        return jnp.mean(w * (x0_s - x0_tgt) ** 2)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, teacher_params, ae_params, batch, scale_factor, rng):
        args = _targets(teacher_params, ae_params, batch, scale_factor, rng)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, *args)
        state = state.apply_gradients(grads)
        return state, {"distill_loss": loss, "grad_norm": optax.global_norm(grads)}

    return step
