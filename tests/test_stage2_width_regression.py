"""Regression marker for the stage-2 width-dependent learning pathology.

Round-5 finding (docs/artifacts/stage2_width_pathology_r5.json): the
identical ``make_stage2_train_step_latents`` configuration learns robustly
at tiny widths but produces NO loss improvement at channel widths >= 64 —
on-chip at the flagship 32g widths (1300 steps, lr 1e-4 and 1e-3) and
reproduced on CPU in under a minute of steps. Bisection ruled out dtype,
EMA, grad clip, res depth, attention, norm groups, io widths, zero-init
output, and the timestep path; the stage-1 VAE trains at the same widths
with the same conv/norm blocks.

Two tests: the tiny-width case GUARDS the learning path (a real regression
here means the trainer broke); the wide case is an xfail that documents the
open bug — when a fix lands, the xpass flips it to a hard test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest

from ldm3d_tpu.diffusion import DDPMScheduler
from ldm3d_tpu.nn import DiffusionUNet3D
from ldm3d_tpu.training import (
    Stage2Config,
    TrainState,
    build_lr_schedule,
    make_diffusion_optimizer,
)
from ldm3d_tpu.training.stage2 import make_stage2_train_step_latents


def _final_loss(channels, steps=40, batch=2):
    unet = DiffusionUNet3D.from_config(
        spatial_dims=3, in_channels=8, out_channels=4, channels=channels,
        attention_levels=[False, True, True], num_head_channels=[0, 8, 8],
        num_res_blocks=1, norm_num_groups=8)
    rng = jax.random.PRNGKey(0)
    lat = (8, 8, 8)
    uv = jax.jit(unet.init)(rng, jnp.zeros((1, *lat, 8)), jnp.zeros((1,), jnp.int32))
    sched = DDPMScheduler.create(num_train_timesteps=1000)
    st = TrainState.create(
        unet.apply, uv["params"],
        make_diffusion_optimizer(build_lr_schedule("multistep", 1e-3, 100, 28)))
    step = make_stage2_train_step_latents(unet, sched, Stage2Config(conditional=True))
    mu = jax.random.normal(rng, (batch, *lat, 4))
    sig = jnp.full(mu.shape, 0.1)
    tb = {"label_mu": mu, "label_sigma": sig, "image_mu": mu * 0.5, "image_sigma": sig}
    last = []
    for i in range(steps):
        st, m = step(st, tb, jnp.float32(1.0), jax.random.PRNGKey(i))
        if i >= steps - 5:
            last.append(float(m["diffusion_loss"]))
    return sum(last) / len(last)


def test_stage2_learns_at_tiny_width():
    """Guards the step/optimizer machinery: tiny widths must clearly descend
    from the zero-prediction plateau (1.0) within 40 steps at lr 1e-3."""
    assert _final_loss([16, 32, 32]) < 0.92


@pytest.mark.xfail(
    reason="open round-5 bug: widths >= 64 sit at the zero-prediction plateau "
    "(docs/artifacts/stage2_width_pathology_r5.json); an XPASS here means the "
    "fix landed — promote this to a hard assertion",
    strict=False,
)
def test_stage2_learns_at_mid_width():
    assert _final_loss([64, 128, 256]) < 0.92
