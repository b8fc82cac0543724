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

__all__ = ["DDPMScheduler", "DDIMScheduler", "DPMSolverPPScheduler", "GridDDIMScheduler",
           "make_betas", "make_timestep_grid", "distillation_grid", "karras_timestep_grid"]

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


def make_timestep_grid(num_train_timesteps: int, n: int, spacing: str) -> jnp.ndarray:
    """Descending inference timesteps for an ``n``-step subsampled schedule.

    ``"leading"`` (default, MONAI ``set_timesteps`` parity): multiples of the
    stride, ending at t=0 — the FIRST step starts at ``(n-1)*stride`` (e.g.
    950 for 50 steps of a 1000-step schedule), so the highest-noise band
    [951, 999] is never visited. ``"trailing"`` anchors the grid at
    ``num_train_timesteps - 1`` instead, covering the band where the initial
    N(0,1) sample actually lives (Lin et al. 2024, "Common Diffusion Noise
    Schedules and Sample Steps are Flawed") at the cost of ending one stride
    short of t=0. Both spacings are uniform with the same stride, so
    per-step previous-state math is unchanged.

    Terminal-state caveat: DDIM/DDPM detect the terminal jump by
    ``t - stride < 0``, which on a trailing grid only holds when ``n``
    divides ``num_train_timesteps`` (final t = (T mod n) - 1 + ... >= 0
    otherwise, leaving residual noise at the last visited level) — their
    ``create`` methods therefore REJECT non-divisible trailing configs.
    DPM-Solver++ appends the terminal alpha_bar = 1 state explicitly and is
    exact for any count.
    """
    stride = num_train_timesteps // n
    if spacing == "leading":
        return jnp.arange(n - 1, -1, -1, dtype=jnp.int32) * stride
    if spacing == "trailing":
        return (num_train_timesteps - 1) - jnp.arange(n, dtype=jnp.int32) * stride
    raise ValueError(
        f"timestep_spacing must be 'leading' or 'trailing', got {spacing!r}"
        + (" ('karras' spacing is grid-based: available on the dpm/dpm3 "
           "samplers and on ddim via make_sampling_scheduler/GridDDIMScheduler)"
           if spacing == "karras" else ""))


def karras_timestep_grid(
    num_train_timesteps: int,
    n: int,
    schedule: str = "scaled_linear_beta",
    beta_start: float = 0.0015,
    beta_end: float = 0.0195,
    rho: float = 7.0,
):
    """Descending timesteps whose noise levels follow the Karras et al. 2022
    (EDM, arXiv:2206.00364) sigma spacing: sigma_i = (sigma_max^(1/rho) +
    i/(n-1) * (sigma_min^(1/rho) - sigma_max^(1/rho)))^rho, mapped onto the
    discrete VP schedule by nearest noise level sigma(t) = sqrt((1-abar_t)/
    abar_t). rho=7 concentrates steps at LOW noise where discretization error
    dominates sample detail. Anchored at both ends: grid[0] = T-1 (where the
    initial N(0,1) sample lives — the property 'trailing' has and 'leading'
    lacks) and grid[-1] = 0 (full denoise — the property 'leading' has and
    'trailing' lacks). Raises when n is too large for the schedule to keep
    the mapped timesteps distinct.
    """
    import numpy as np

    if not (2 <= n <= num_train_timesteps):
        raise ValueError(f"karras grid needs 2 <= steps <= {num_train_timesteps}, got {n}")
    betas = np.asarray(make_betas(num_train_timesteps, schedule, beta_start, beta_end),
                       np.float64)
    abar = np.cumprod(1.0 - betas)
    sig = np.sqrt((1.0 - abar) / abar)  # ascending in t
    smin, smax = float(sig[0]), float(sig[-1])
    frac = np.linspace(0.0, 1.0, n)
    sigmas = (smax ** (1.0 / rho) + frac * (smin ** (1.0 / rho) - smax ** (1.0 / rho))) ** rho
    # nearest discrete timestep per target sigma (sig is ascending)
    hi = np.clip(np.searchsorted(sig, sigmas), 1, num_train_timesteps - 1)
    ts = np.where(np.abs(sigmas - sig[hi - 1]) <= np.abs(sig[hi] - sigmas),
                  hi - 1, hi).astype(np.int32)
    if len(np.unique(ts)) != n:
        raise ValueError(
            f"{n}-step karras grid over {num_train_timesteps} timesteps maps "
            f"multiple steps onto the same timestep; reduce the step count")
    return ts


def _check_trailing_divisible(num_train_timesteps: int, n: int, spacing: str) -> None:
    """DDIM/DDPM terminal detection (``t - stride < 0``) requires trailing
    grids to divide the schedule evenly; reject the silent-residual-noise
    configuration loudly (found in review: the final step of e.g. T=64, n=6
    trailing stopped at t_prev=3, leaving x at the t=3 noise level)."""
    if spacing == "trailing" and num_train_timesteps % n:
        raise ValueError(
            f"trailing timestep_spacing requires num_inference_steps to divide "
            f"num_train_timesteps ({num_train_timesteps}); got {n} — the final "
            f"DDIM/DDPM step would stop short of the terminal state. Use a "
            f"divisor step count, or the dpm/dpm3 sampler (exact for any count).")


def _noise_coeffs(alphas_cumprod: jax.Array, t: jax.Array, like: jax.Array):
    """(sqrt(abar_t), sqrt(1-abar_t)) broadcast against ``like``.

    The sqrt runs in fp32 and only the RESULT casts to the compute dtype:
    casting abar itself to bf16 first destroys the low-noise end of the
    schedule — with the default beta_start=0.0015, abar_0=0.9985 rounds to
    bf16 1.0, so sqrt(1-abar) becomes exactly 0 and t=0 training pairs a
    noise-FREE x_t with a nonzero-noise target (measured: true 0.0387 vs
    bf16 0.0)."""
    a = jnp.take(alphas_cumprod.astype(jnp.float32), t)
    a = a.reshape(a.shape + (1,) * (like.ndim - a.ndim))
    return jnp.sqrt(a).astype(like.dtype), jnp.sqrt(1.0 - a).astype(like.dtype)


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
    """Ancestral DDPM sampler/noiser. Static config lives in pytree aux data.

    ``num_inference_steps=None`` (default) runs the full training schedule —
    the reference's behavior. A smaller value subsamples the schedule exactly
    like MONAI's ``DDPMScheduler.set_timesteps``: stride ``num_train // n``,
    with the per-step alpha/beta derived from the alphas-cumprod ratio of the
    visited timesteps (``current_beta_t = 1 - a_t / a_prev``)."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)
    num_inference_steps: int | None = struct.field(pytree_node=False, default=None)
    prediction_type: str = struct.field(pytree_node=False, default="epsilon")
    clip_sample: bool = struct.field(pytree_node=False, default=True)
    clip_range: float = struct.field(pytree_node=False, default=1.0)
    timestep_spacing: str = struct.field(pytree_node=False, default="leading")

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        schedule: str = "scaled_linear_beta",
        beta_start: float = 0.0015,
        beta_end: float = 0.0195,
        num_inference_steps: int | None = None,
        prediction_type: str = "epsilon",
        clip_sample: bool = True,
        clip_range: float = 1.0,
        timestep_spacing: str = "leading",
    ) -> "DDPMScheduler":
        if num_inference_steps is not None and not (1 <= num_inference_steps <= num_train_timesteps):
            raise ValueError(
                f"num_inference_steps must be in [1, {num_train_timesteps}], "
                f"got {num_inference_steps}")
        betas = make_betas(num_train_timesteps, schedule, beta_start, beta_end)
        alphas_cumprod = jnp.cumprod(1.0 - betas)
        make_timestep_grid(num_train_timesteps, num_inference_steps or num_train_timesteps,
                           timestep_spacing)  # validates the spacing name eagerly
        _check_trailing_divisible(num_train_timesteps, num_inference_steps or num_train_timesteps,
                                  timestep_spacing)
        return cls(
            betas=betas,
            alphas_cumprod=alphas_cumprod,
            num_train_timesteps=num_train_timesteps,
            num_inference_steps=num_inference_steps,
            prediction_type=prediction_type,
            clip_sample=clip_sample,
            clip_range=clip_range,
            timestep_spacing=timestep_spacing,
        )

    @property
    def _stride(self) -> int:
        n = self.num_inference_steps or self.num_train_timesteps
        return self.num_train_timesteps // n

    @property
    def timesteps(self) -> jnp.ndarray:
        """Descending timesteps for the reverse loop (full schedule by
        default; strided when ``num_inference_steps`` subsamples)."""
        n = self.num_inference_steps or self.num_train_timesteps
        return make_timestep_grid(self.num_train_timesteps, n, self.timestep_spacing)

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """q(x_t | x_0): supports per-sample timesteps ``t`` of shape (B,)."""
        sqrt_a, sqrt_1ma = _noise_coeffs(self.alphas_cumprod, t, x0)
        return sqrt_a * x0 + sqrt_1ma * noise

    def velocity(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """Target for v-prediction training."""
        sqrt_a, sqrt_1ma = _noise_coeffs(self.alphas_cumprod, t, x0)
        return sqrt_a * noise - sqrt_1ma * x0

    def step(self, model_output: jax.Array, t: jax.Array, x_t: jax.Array, rng: jax.Array) -> jax.Array:
        """One reverse step x_t -> x_{t-1} (scalar traced timestep ``t``)."""
        x32 = x_t.astype(jnp.float32)
        pred = model_output.astype(jnp.float32)
        stride = self._stride
        a_t = jnp.take(self.alphas_cumprod, t)
        t_prev = t - stride
        a_prev = jnp.where(t_prev >= 0, jnp.take(self.alphas_cumprod, jnp.maximum(t_prev, 0)), 1.0)
        if stride == 1:
            beta_t = jnp.take(self.betas, t)  # table lookup: bit-exact full-schedule path
        else:
            beta_t = 1.0 - a_t / a_prev  # effective beta over the strided jump
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
    timestep_spacing: str = struct.field(pytree_node=False, default="leading")

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
        timestep_spacing: str = "leading",
    ) -> "DDIMScheduler":
        if not (1 <= num_inference_steps <= num_train_timesteps):
            raise ValueError(
                f"num_inference_steps must be in [1, {num_train_timesteps}], "
                f"got {num_inference_steps}")
        betas = make_betas(num_train_timesteps, schedule, beta_start, beta_end)
        make_timestep_grid(num_train_timesteps, num_inference_steps, timestep_spacing)
        _check_trailing_divisible(num_train_timesteps, num_inference_steps, timestep_spacing)
        return cls(
            betas=betas,
            alphas_cumprod=jnp.cumprod(1.0 - betas),
            num_train_timesteps=num_train_timesteps,
            num_inference_steps=num_inference_steps,
            prediction_type=prediction_type,
            clip_sample=clip_sample,
            clip_range=clip_range,
            eta=eta,
            timestep_spacing=timestep_spacing,
        )

    @property
    def timesteps(self) -> jnp.ndarray:
        return make_timestep_grid(self.num_train_timesteps, self.num_inference_steps,
                                  self.timestep_spacing)

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        sqrt_a, sqrt_1ma = _noise_coeffs(self.alphas_cumprod, t, x0)
        return sqrt_a * x0 + sqrt_1ma * noise

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


def distillation_grid(num_train_timesteps: int, n: int):
    """N+1 descending boundary timesteps for an N-step distillation/sampling
    grid: ``round(linspace(T-1, 0, N+1))``.

    The visited timesteps are ``grid[:-1]``; the final jump goes to the
    TERMINAL state (alpha_bar = 1, x collapses onto the predicted x0), so
    ``grid[-1]`` is only a boundary marker. The linspace form is self-similar
    under halving — ``distillation_grid(T, n)[::2] == distillation_grid(T,
    n//2)`` — which is exactly the alignment progressive distillation needs
    (each student step spans two consecutive teacher steps), and it supports
    ANY n <= T, unlike stride grids which need divisibility.
    """
    import numpy as np

    if not (1 <= n <= num_train_timesteps):
        raise ValueError(f"grid steps must be in [1, {num_train_timesteps}], got {n}")
    b = np.round(np.linspace(num_train_timesteps - 1, 0, n + 1)).astype(np.int32)
    if len(np.unique(b)) != n + 1:
        raise ValueError(f"{n}-step grid over {num_train_timesteps} timesteps "
                         f"has duplicate entries; reduce the step count")
    return b


@struct.dataclass
class GridDDIMScheduler:
    """Deterministic DDIM over an EXPLICIT descending timestep grid.

    Built for sampling progressively-distilled students
    (:mod:`ldm3d_tpu.training.distill`), whose few-step grids
    (``distillation_grid``) are not uniform strides — but general: any
    strictly-descending timestep sequence works (e.g. Karras-style spacings).
    The final step jumps to the terminal state (alpha_bar = 1). Compatible
    with ``inferer.sample_latents``'s plain scheduler path: the successor
    alpha_bar is looked up from a precomputed per-timestep table, so ``step``
    keeps the ``(model_output, t, x_t, rng)`` signature.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    grid: jnp.ndarray  # (N,) visited timesteps, descending
    next_abar: jnp.ndarray  # (T,) alpha_bar of the successor state at each visited t
    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)
    prediction_type: str = struct.field(pytree_node=False, default="epsilon")
    clip_sample: bool = struct.field(pytree_node=False, default=True)
    clip_range: float = struct.field(pytree_node=False, default=1.0)

    @classmethod
    def create(
        cls,
        timesteps,
        num_train_timesteps: int = 1000,
        schedule: str = "scaled_linear_beta",
        beta_start: float = 0.0015,
        beta_end: float = 0.0195,
        prediction_type: str = "epsilon",
        clip_sample: bool = True,
        clip_range: float = 1.0,
    ) -> "GridDDIMScheduler":
        import numpy as np

        ts = np.asarray(timesteps, dtype=np.int32)
        if ts.ndim != 1 or len(ts) < 1:
            raise ValueError("timesteps must be a 1-D sequence")
        if np.any(np.diff(ts) >= 0):
            raise ValueError("timesteps must be strictly descending")
        if ts[0] >= num_train_timesteps or ts[-1] < 0:
            raise ValueError(f"timesteps out of range [0, {num_train_timesteps})")
        betas = make_betas(num_train_timesteps, schedule, beta_start, beta_end)
        abar = jnp.cumprod(1.0 - betas)
        # successor state per visited timestep; the last visited t -> terminal
        succ = np.ones((num_train_timesteps,), np.float32)
        abar_np = np.asarray(abar)
        succ[ts[:-1]] = abar_np[ts[1:]]
        return cls(
            betas=betas,
            alphas_cumprod=abar,
            grid=jnp.asarray(ts),
            next_abar=jnp.asarray(succ),
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
            clip_sample=clip_sample,
            clip_range=clip_range,
        )

    @property
    def num_inference_steps(self) -> int:
        return int(self.grid.shape[0])

    @property
    def timesteps(self) -> jnp.ndarray:
        return self.grid

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        sqrt_a, sqrt_1ma = _noise_coeffs(self.alphas_cumprod, t, x0)
        return sqrt_a * x0 + sqrt_1ma * noise

    def step(self, model_output: jax.Array, t: jax.Array, x_t: jax.Array, rng: jax.Array) -> jax.Array:
        del rng  # deterministic (eta = 0)
        x32 = x_t.astype(jnp.float32)
        pred = model_output.astype(jnp.float32)
        a_t = jnp.take(self.alphas_cumprod, t)
        a_prev = jnp.take(self.next_abar, t)
        x0, eps = _pred_x0_and_eps(pred, x32, a_t, self.prediction_type)
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_range, self.clip_range)
            eps = (x32 - jnp.sqrt(a_t) * x0) / jnp.sqrt(1.0 - a_t)
        sample = jnp.sqrt(a_prev) * x0 + jnp.sqrt(jnp.clip(1.0 - a_prev, 0.0)) * eps
        return sample.astype(x_t.dtype)


@struct.dataclass
class DPMSolverPPScheduler:
    """DPM-Solver++ (2M/3M): deterministic multistep ODE solver, order 2 or 3.

    A modern fast sampler beyond the reference's capability set (the
    reference has only the 1000-step DDPM loop; we add DDIM and this) —
    typically matches DDIM quality at 2-4x fewer steps. Data-prediction
    formulation (Lu et al. 2022, "DPM-Solver++"), multistep with lower-order
    warm-up (step 0 first-order, step 1 second-order) and a first-order
    final step for terminal stability. Order 3 is measurably more accurate
    at >=20 steps but UNSTABLE below ~15 (the known multistep-order trade,
    quantified in ``tests/test_schedulers.py::test_dpm3_gaussian_oracle_beats_2m``)
    — order 2 remains the fast-sampling default.

    All update coefficients are precomputed per step index, so the reverse
    loop scans with a ``(x, x0_prev, x0_prev2)`` carry and no control flow:

        x_{i+1} = c_x[i]*x_i + c_d[i]*x0_i
                  + c2[i]*(x0_i - x0_{i-1}) + c3[i]*(x0_{i-1} - x0_{i-2})

    with alpha = sqrt(alpha_bar), sigma = sqrt(1 - alpha_bar),
    lambda = log(alpha/sigma), h_i = lambda_{i+1} - lambda_i:
      c_x = sigma_{i+1}/sigma_i,  c_d = alpha_{i+1} * (1 - e^{-h_i}).
    Order 2 (``solver_order=2``, default): c2 = 0.5*c_d*h_i/h_{i-1}, c3 = 0
    — the 2M update. Order 3 folds the 3M difference operators D1/D2
    (with r0 = h_{i-1}/h_i, r1 = h_{i-2}/h_i, phi1 = 1-e^{-h}:
    D1-coeff p1 = alpha*(1 - phi1/h), D2-coeff p2 = alpha*(0.5 - (h-phi1)/h^2))
    into per-step scalars on the two x0 differences; step 1 keeps its 2M
    coefficient. The terminal target is alpha_bar = 1 (x collapses onto the
    predicted x0: c_x = 0, c_d = 1), which stays finite because e^{-h} is
    formed as a sigma/alpha ratio product, never from h itself.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    c_x: jnp.ndarray
    c_d: jnp.ndarray
    c2: jnp.ndarray
    c3: jnp.ndarray
    grid: jnp.ndarray  # (N,) visited timesteps, descending
    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)
    num_inference_steps: int = struct.field(pytree_node=False, default=20)
    prediction_type: str = struct.field(pytree_node=False, default="epsilon")
    clip_sample: bool = struct.field(pytree_node=False, default=True)
    clip_range: float = struct.field(pytree_node=False, default=1.0)
    multistep: bool = struct.field(pytree_node=False, default=True)
    solver_order: int = struct.field(pytree_node=False, default=2)
    timestep_spacing: str = struct.field(pytree_node=False, default="leading")

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        schedule: str = "scaled_linear_beta",
        beta_start: float = 0.0015,
        beta_end: float = 0.0195,
        num_inference_steps: int = 20,
        prediction_type: str = "epsilon",
        clip_sample: bool = True,
        clip_range: float = 1.0,
        solver_order: int = 2,
        timestep_spacing: str = "leading",
    ) -> "DPMSolverPPScheduler":
        if not (1 <= num_inference_steps <= num_train_timesteps):
            raise ValueError(
                f"num_inference_steps must be in [1, {num_train_timesteps}], "
                f"got {num_inference_steps}")
        if solver_order not in (2, 3):
            raise ValueError(f"solver_order must be 2 or 3, got {solver_order}")
        betas = make_betas(num_train_timesteps, schedule, beta_start, beta_end)
        a_bar = jnp.cumprod(1.0 - betas)
        if timestep_spacing == "karras":
            # the per-step coefficients below derive from the grid's own
            # lambda gaps (h_i), so non-uniform grids need no special casing
            ts = jnp.asarray(karras_timestep_grid(
                num_train_timesteps, num_inference_steps, schedule, beta_start, beta_end))
        else:
            ts = make_timestep_grid(num_train_timesteps, num_inference_steps, timestep_spacing)
        # grid of (alpha, sigma) at each visited state, plus the terminal x0 state
        a_grid = jnp.concatenate([jnp.take(a_bar, ts), jnp.ones((1,), jnp.float32)])
        alpha = jnp.sqrt(a_grid)
        sigma = jnp.sqrt(1.0 - a_grid)
        c_x = sigma[1:] / jnp.clip(sigma[:-1], 1e-12)
        exp_neg_h = (sigma[1:] * alpha[:-1]) / jnp.clip(sigma[:-1] * alpha[1:], 1e-12)
        c_d = alpha[1:] * (1.0 - exp_neg_h)
        # difference-term coefficients: finite h values only (not the terminal step)
        lam = jnp.log(jnp.clip(alpha[:-1], 1e-12)) - jnp.log(jnp.clip(sigma[:-1], 1e-12))
        h = lam[1:] - lam[:-1]  # h_i for i in [0, N-2]
        n = num_inference_steps
        c2 = jnp.zeros((n,), jnp.float32)
        c3 = jnp.zeros((n,), jnp.float32)
        if n > 2:
            ratio = h[1:] / jnp.clip(h[:-1], 1e-12)  # h_i / h_{i-1}, i in [1, N-2]
            c2 = c2.at[1 : n - 1].set(0.5 * c_d[1 : n - 1] * ratio)
        if solver_order == 3 and n > 3:
            # steps i in [2, N-2]: full 3M update (step 1 keeps its 2M c2)
            i = jnp.arange(2, n - 1)
            h_i, h_p, h_pp = h[i], h[i - 1], h[i - 2]
            r0 = h_p / jnp.clip(h_i, 1e-12)
            r1 = h_pp / jnp.clip(h_i, 1e-12)
            u, v = 1.0 / jnp.clip(r0, 1e-12), 1.0 / jnp.clip(r1, 1e-12)
            w = r0 / jnp.clip(r0 + r1, 1e-12)
            phi1 = 1.0 - exp_neg_h[i]
            a_next = alpha[i + 1]
            p1 = a_next * (1.0 - phi1 / h_i)
            p2 = a_next * (0.5 - (h_i - phi1) / (h_i * h_i))
            c2 = c2.at[i].set(p1 * (1.0 + w) * u + p2 * u / (r0 + r1))
            c3 = c3.at[i].set(-(p1 * w * v + p2 * v / (r0 + r1)))
        return cls(
            betas=betas,
            alphas_cumprod=a_bar,
            c_x=c_x,
            c_d=c_d,
            c2=c2,
            c3=c3,
            grid=ts,
            num_train_timesteps=num_train_timesteps,
            num_inference_steps=num_inference_steps,
            prediction_type=prediction_type,
            clip_sample=clip_sample,
            clip_range=clip_range,
            solver_order=solver_order,
            timestep_spacing=timestep_spacing,
        )

    @property
    def timesteps(self) -> jnp.ndarray:
        return self.grid

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        sqrt_a, sqrt_1ma = _noise_coeffs(self.alphas_cumprod, t, x0)
        return sqrt_a * x0 + sqrt_1ma * noise

    def step_multistep(
        self, model_output: jax.Array, i: jax.Array, t: jax.Array,
        x_t: jax.Array, x0_prev: jax.Array, x0_prev2: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """One 2M/3M update at step index ``i`` (timestep ``t``); returns
        ``(x_next, x0_current)`` — the caller carries the last two x0
        predictions across steps (``x0_prev2`` may be omitted at order 2)."""
        x32 = x_t.astype(jnp.float32)
        pred = model_output.astype(jnp.float32)
        a_t = jnp.take(self.alphas_cumprod, t)
        x0, _ = _pred_x0_and_eps(pred, x32, a_t, self.prediction_type)
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_range, self.clip_range)
        x_next = (
            jnp.take(self.c_x, i) * x32
            + jnp.take(self.c_d, i) * x0
            + jnp.take(self.c2, i) * (x0 - x0_prev)
        )
        if self.solver_order >= 3:
            if x0_prev2 is None:
                raise ValueError("solver_order=3 requires the x0_prev2 carry")
            x_next = x_next + jnp.take(self.c3, i) * (x0_prev - x0_prev2)
        return x_next.astype(x_t.dtype), x0.astype(x_t.dtype)
