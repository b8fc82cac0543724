"""Measure peak HBM of a training recipe on the attached device.

Round-3 verdict item 3: ``check_system`` recommended the stage-1 no-remat
batch-8 recipe from a single "it fits 16 GB" observation, with no headroom
number — and that exact recipe OOM'd inside the round-3 bench process. This
tool turns "fits" into a measurement: it runs REAL train steps at a given
(batch, patch, remat) recipe and prints the device allocator's high-water
mark next to its capacity, i.e. the margin the recommendation rides on.

One recipe per invocation (the allocator's peak counter is process-global)::

    python tools/hbm_probe.py stage1 --batch 8 --volume 64 --remat none
    python tools/hbm_probe.py stage1 --batch 8 --volume 64 --remat convs
    python tools/hbm_probe.py stage2 --batch 8 --volume 96 --remat full

Prints one JSON line: recipe, peak_bytes_in_use, bytes_limit, headroom_frac,
step_ms. The measured anchors are pinned in ``ldm3d_tpu/cli/check_system.py``
as ``_STAGE1_STATE_BYTES`` / ``_STAGE1_ACT_BYTES_PER_VOXEL`` (with provenance
comments) and drive its modeled-headroom recommendation; re-run this tool
after a jax/libtpu upgrade and refresh those constants if they move.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def probe_stage1(batch: int, volume: int, remat, repeats: int) -> dict:
    import jax
    import jax.numpy as jnp

    from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path
    from ldm3d_tpu.nn import LPIPS, PatchDiscriminator3D
    from ldm3d_tpu.training import (Stage1Config, TrainState, make_optimizer,
                                    make_stage1_train_step)

    cfg = load_json(preset_path("config_train_32g.json"))
    ae = (ConfigResolver(cfg).instantiate("autoencoder_def")
          .clone(dtype=jnp.bfloat16, remat=remat))
    disc = PatchDiscriminator3D(num_layers_d=3, channels=32, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    v = volume
    x = jax.random.uniform(rng, (batch, v, v, v, ae.in_channels), jnp.float32)
    g_params = jax.jit(ae.init)({"params": rng, "sample": rng},
                                jnp.zeros((1, v, v, v, ae.in_channels), jnp.bfloat16))["params"]
    d_params = jax.jit(disc.init)(rng, jnp.zeros((1, v, v, v, ae.in_channels), jnp.bfloat16))["params"]
    lp = LPIPS(dtype=jnp.bfloat16)
    lp_vars = jax.jit(lp.init)(jax.random.PRNGKey(17),
                               jnp.zeros((1, 16, 16, 1), jnp.bfloat16),
                               jnp.zeros((1, 16, 16, 1), jnp.bfloat16))
    step = make_stage1_train_step(ae, disc, lambda a, b: lp.apply(lp_vars, a, b),
                                  Stage1Config())
    g_st = TrainState.create(ae.apply, g_params, make_optimizer(1e-4))
    d_st = TrainState.create(disc.apply, d_params, make_optimizer(1e-4))
    g_st, d_st, m = step(g_st, d_st, x, jax.random.PRNGKey(3), True)
    float(m["recon_loss"])  # compile + warm
    t0 = time.perf_counter()
    for i in range(repeats):
        g_st, d_st, m = step(g_st, d_st, x, jax.random.PRNGKey(4 + i), True)
    float(m["recon_loss"])
    return {"step_ms": (time.perf_counter() - t0) / repeats * 1000}


def probe_stage2(batch: int, volume: int, remat, repeats: int) -> dict:
    import jax
    import jax.numpy as jnp

    from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path
    from ldm3d_tpu.diffusion import DDPMScheduler
    from ldm3d_tpu.training import (Stage2Config, TrainState,
                                    make_diffusion_optimizer,
                                    make_stage2_train_step_latents)

    cfg = load_json(preset_path("config_train_32g.json"))
    r = ConfigResolver(cfg)
    ae = r.instantiate("autoencoder_def").clone(dtype=jnp.bfloat16)
    unet = (r.instantiate("diffusion_def")
            .clone(dtype=jnp.bfloat16, remat=bool(remat)))
    rng = jax.random.PRNGKey(0)
    latent = volume // ae.downsample_factor
    lc = ae.latent_channels
    cond_ch = unet.in_channels - lc
    u_params = jax.jit(unet.init)(
        rng, jnp.zeros((1, 8, 8, 8, unet.in_channels), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32))["params"]
    state = TrainState.create(apply_fn=unet.apply, params=u_params,
                              tx=make_diffusion_optimizer(1e-4))
    sched = DDPMScheduler.create(num_train_timesteps=1000)
    step = make_stage2_train_step_latents(unet, sched, Stage2Config(conditional=True))
    tb = {
        "label_mu": jax.random.normal(rng, (batch, latent, latent, latent, lc), jnp.float32),
        "label_sigma": jnp.full((batch, latent, latent, latent, lc), 0.1, jnp.float32),
        "image_mu": jax.random.normal(rng, (batch, latent, latent, latent, cond_ch), jnp.float32),
        "image_sigma": jnp.full((batch, latent, latent, latent, cond_ch), 0.1, jnp.float32),
    }
    state, m = step(state, tb, jnp.float32(0.9), jax.random.PRNGKey(7))
    float(m["diffusion_loss"])
    t0 = time.perf_counter()
    for i in range(repeats):
        state, m = step(state, tb, jnp.float32(0.9), jax.random.PRNGKey(8 + i))
    float(m["diffusion_loss"])
    return {"step_ms": (time.perf_counter() - t0) / repeats * 1000}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("stage", choices=["stage1", "stage2"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--volume", type=int, default=64)
    p.add_argument("--remat", default="none", choices=["none", "convs", "full"])
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args(argv)

    import jax

    remat = {"none": False, "convs": "convs", "full": True}[args.remat]
    fn = probe_stage1 if args.stage == "stage1" else probe_stage2
    out = fn(args.batch, args.volume, remat, args.repeats)

    stats = jax.devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    limit = stats.get("bytes_limit")
    rec = {
        "recipe": {"stage": args.stage, "batch": args.batch,
                   "volume": args.volume, "remat": args.remat},
        "peak_bytes_in_use": peak,
        "peak_gib": round(peak / 2**30, 2) if peak else None,
        "bytes_limit": limit,
        "limit_gib": round(limit / 2**30, 2) if limit else None,
        "headroom_frac": (round(1 - peak / limit, 3) if peak and limit else None),
        "step_ms": round(out["step_ms"], 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
