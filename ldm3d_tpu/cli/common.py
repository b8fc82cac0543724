"""Shared CLI plumbing for the training/inference drivers.

Flag parity with the reference entry points (``train_autoencoder.py:65-84``):
``-e/--environment-file``, ``-c/--config-file``, ``-g/--gpus`` (interpreted as
the number of mesh devices; 0/absent = all visible), ``--amp`` (bf16 compute —
the TPU equivalent of the reference's fp16 AMP, loss-scaler-free),
``--compile`` (accepted for parity; jit is always on), ``--profile``,
``--no-images``.
"""

from __future__ import annotations

import argparse
import logging
import sys

import jax
import jax.numpy as jnp

from ldm3d_tpu.configs import preset_path
from ldm3d_tpu.parallel import MeshSpec, create_mesh
from ldm3d_tpu.utils import merge_configs_onto_args

__all__ = ["build_parser", "setup", "model_dtype", "global_batch_size",
           "script_entry", "enable_persistent_compile_cache"]


def script_entry(main):
    """Wrap a CLI ``main`` for a console-script entry point: setuptools calls
    ``sys.exit(fn())``, so the programmatic return value of ``main``
    (paths/metrics for in-process callers like the pipeline) must not leak
    into the exit status."""

    def script_main():
        main()
        return 0

    return script_main


def enable_persistent_compile_cache() -> None:
    """Persistent XLA compile cache: the flagship programs (train steps,
    samplers) compile once per machine; restarts — preemption-resume cycles
    especially — skip minutes of compilation. The JAX_COMPILATION_CACHE_DIR
    env var, when set, wins."""
    import os

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/ldm3d_tpu/xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — older jax without the option
        pass


def build_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("-e", "--environment-file", default=preset_path("environment.json"),
                   help="environment json file that stores environment paths")
    p.add_argument("-c", "--config-file", default=preset_path("config_train_32g.json"),
                   help="config json file that stores hyper-parameters")
    p.add_argument("-g", "--gpus", default=0, type=int,
                   help="number of devices to use (0 = all visible chips)")
    p.add_argument("--amp", action="store_true",
                   help="bf16 compute (TPU-native mixed precision, no loss scaler)")
    p.add_argument("--compile", action="store_true",
                   help="accepted for reference parity; jit is always on")
    p.add_argument("--profile", action="store_true", help="enable jax.profiler trace window")
    p.add_argument("--no-images", action="store_true", help="disable image logging to tensorboard")
    p.add_argument("--max-epochs", type=int, default=None, help="override config max_epochs")
    p.add_argument("--synthetic-data", action="store_true",
                   help="train on generated synthetic pairs when no NPZ dirs are set")
    p.add_argument("--track", action="store_true",
                   help="record the run in the experiment tracker (MLflow if installed, local JSON otherwise)")
    p.add_argument("--experiment", default="ldm3d-tpu", help="experiment name for --track")
    p.add_argument("--debug-nans", action="store_true",
                   help="dev mode: raise at the op producing a NaN (jax_debug_nans)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="gradient accumulation steps (the reference documents but never implemented this)")
    p.add_argument("--remat", nargs="?", const="full", default=None,
                   choices=["full", "convs"],
                   help="rematerialize ResBlocks (gradient checkpointing). Bare "
                        "--remat = 'full' (minimum memory, re-runs forward convs in "
                        "the backward); --remat convs saves the MXU conv outputs and "
                        "recomputes only GroupNorm/SiLU — near-full-speed at ~1/3 of "
                        "the unremated activation memory. At 64^3 batch 8 on one v5e "
                        "NO remat fits and is fastest (docs/PERFORMANCE.md round-3 "
                        "stage-1 audit)")
    p.add_argument("--spatial", type=int, default=1,
                   help="spatial (context) parallel axis size: shard volume depth over this many "
                        "devices per replica (see docs/SCALING.md)")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="keep an EMA of the diffusion UNet params (e.g. 0.9999); saved as the "
                        "'ema' checkpoint role, used by inference --use-ema")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for multi-host (pod) runs; "
                        "auto-detects the coordinator on TPU pods")
    p.add_argument("--tensor", type=int, default=1,
                   help="tensor-parallel axis size: shard weight output channels (GSPMD) over "
                        "this many devices per replica (see docs/SCALING.md)")
    p.add_argument("--zero", action="store_true",
                   help="ZeRO-1: shard optimizer moments over the data axis (~1/N optimizer "
                        "memory; the reference only lists this as future work). Composes with "
                        "--tensor; see docs/SCALING.md")
    p.add_argument("--fsdp", action="store_true",
                   help="FSDP (ZeRO-3): shard params + optimizer moments + EMA over the data "
                        "axis (~1/N training-state memory; XLA all-gathers weights per use and "
                        "reduce-scatters grads). Supersedes --zero; composes with --tensor and "
                        "--spatial; see docs/SCALING.md")
    p.add_argument("--pipeline", type=int, default=1,
                   help="pipeline-parallel stage axis size (stage 2 only): run the UNet's "
                        "uniform mid_depth bottleneck stack as a GPipe microbatch schedule "
                        "over this many devices per replica; requires diffusion_def.mid_depth "
                        "divisible by it (see docs/SCALING.md)")
    p.add_argument("--pipeline-microbatches", type=int, default=0,
                   help="microbatches per step for --pipeline (0 = one volume per microbatch); "
                        "must divide the per-replica batch; more microbatches shrink the "
                        "pipeline bubble (S-1)/(M+S-1)")
    return p


def track_run(args, stage: str, final_metrics: dict) -> None:
    """Log a finished training run when --track is set."""
    if not getattr(args, "track", False):
        return
    from ldm3d_tpu.mlops.tracking import ExperimentTracker, log_training_run

    tracker = ExperimentTracker(args.experiment)
    config = {
        "stage": stage,
        "config_file": args.config_file,
        "amp": bool(args.amp),
        "devices": len(jax.devices()),
    }
    section = getattr(args, f"{stage}_train", None)
    if isinstance(section, dict):
        config.update({f"{stage}_{k}": v for k, v in section.items()})
    run_id = log_training_run(tracker, config, final_metrics,
                              checkpoint_dir=getattr(args, "model_dir", None),
                              run_name=f"{stage}")
    logging.info("tracked run %s (%s)", run_id, stage)


def setup(args) -> tuple:
    """Merge configs, build the mesh, return (args, mesh)."""
    import os

    # honor JAX_PLATFORMS even when a sitecustomize re-pinned the platform
    # after env parsing (some dev images do); no-op in normal environments
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except RuntimeError:
            pass  # backend already initialized; keep whatever is live
    enable_persistent_compile_cache()
    logging.basicConfig(
        stream=sys.stdout,
        level=logging.INFO,
        format="[%(asctime)s.%(msecs)03d][%(levelname)5s](%(name)s) - %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
        force=True,  # absl installs a root handler at import; replace it
    )
    # orbax/absl emit INFO per checkpoint shard; keep trainer logs readable
    logging.getLogger("absl").setLevel(logging.WARNING)
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
        logging.info("debug mode: jax_debug_nans enabled")
    if getattr(args, "multihost", False):
        from ldm3d_tpu.parallel import init_multihost

        init_multihost()  # must precede the first device query below
    merge_configs_onto_args(args, args.environment_file, args.config_file)
    devices = jax.devices()
    n = args.gpus if args.gpus and args.gpus > 0 else len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)} visible")
    spatial = max(1, getattr(args, "spatial", 1))
    tensor = max(1, getattr(args, "tensor", 1))
    stage = max(1, getattr(args, "pipeline", 1))
    # --spatial and --tensor compose: the spatial steps keep 'model' as an
    # auto (GSPMD) axis inside their shard_map, so TP-sharded weights flow
    # through (docs/SCALING.md). --pipeline composes with the data axis only.
    if stage > 1 and (spatial > 1 or tensor > 1):
        raise ValueError("--pipeline composes with the data axis only "
                         "(not --spatial/--tensor); see docs/SCALING.md")
    if n % (spatial * tensor * stage):
        raise ValueError(f"--spatial {spatial} x --tensor {tensor} x --pipeline {stage} "
                         f"does not divide {n} devices")
    mesh = create_mesh(MeshSpec(data=n // (spatial * tensor * stage), model=tensor,
                                spatial=spatial, stage=stage),
                       devices=devices[:n])
    logging.info("mesh: %d data x %d tensor x %d spatial x %d stage over %s",
                 n // (spatial * tensor * stage), tensor, spatial, stage,
                 devices[0].platform)
    return args, mesh


def model_dtype(args):
    return jnp.bfloat16 if args.amp else jnp.float32


def env_seed(args, default: int = 42) -> int:
    """The environment seed, honoring an EXPLICIT 0 (the reference's
    set_determinism(42) default applies only when no seed is configured —
    `int(...) or 42` silently turned "seed": 0 into 42, decoupling model RNG
    from the data loaders, which use the raw value)."""
    seed = getattr(args, "seed", None)
    return default if seed is None or seed == "" else int(seed)


def global_batch_size(per_device_batch: int, mesh) -> int:
    """Reference batch_size is per-replica (one process per GPU); the global
    batch over the mesh is per_device * data_axis."""
    if jax.default_backend() == "tpu" and per_device_batch % 8:
        logging.getLogger("ldm3d_tpu").warning(
            "per-chip batch %d pads to the TPU's 8-row sublane quantum — "
            "batch 8 measured 2.5x the batch-2 stage-1 throughput on v5e "
            "(use --remat if memory-bound; docs/PERFORMANCE.md)",
            per_device_batch)
    return per_device_batch * mesh.shape["data"]


def load_two_stage(args, mesh, dt, rng, use_ema: bool = False):
    """Build AE + UNet from config and restore both stages' 'best' artifacts.

    Shared by the inference and evaluate CLIs (same contract as the
    reference's checkpoint loading, ``inference.py:71-77``). Returns
    ``(ae, ae_params, unet, u_params, latent_shape, scale_factor)``;
    ``use_ema`` restores the EMA UNet weights and fails with a clear error
    when they were never trained.
    """
    from ldm3d_tpu.ckpt import CheckpointManager, StageArtifacts
    from ldm3d_tpu.configs import define_instance
    from ldm3d_tpu.parallel import replicated_sharding

    patch_size = args.diffusion_train["patch_size"]
    rep = replicated_sharding(mesh)

    ae = define_instance(args, "autoencoder_def").clone(dtype=dt)
    g_vars = jax.jit(ae.init)({"params": rng, "sample": rng},
                              jnp.zeros((1, *patch_size, args.image_channels), dt))
    ae_params = CheckpointManager(args.model_dir, StageArtifacts.AUTOENCODER).restore_params(
        "best", g_vars["params"], sharding=rep)

    unet = define_instance(args, "diffusion_def").clone(dtype=dt)
    latent_shape = [p // ae.downsample_factor for p in patch_size]
    u_vars = jax.jit(unet.init)(rng, jnp.zeros((1, *latent_shape, unet.in_channels), dt),
                                jnp.zeros((1,), jnp.int32))
    u_ckpt = CheckpointManager(args.model_dir, StageArtifacts.DIFFUSION)
    role = "ema" if use_ema else "best"
    if use_ema and not u_ckpt.exists("ema"):
        raise FileNotFoundError("no 'ema' checkpoint found; train with --ema-decay first")
    u_params = u_ckpt.restore_params(role, u_vars["params"], sharding=rep)
    scale_factor = float(u_ckpt.load_meta("best").get("scale_factor", 1.0))
    logging.info("restored two-stage checkpoints (role=%s, scale_factor=%.6f)", role, scale_factor)
    return ae, ae_params, unet, u_params, latent_shape, scale_factor


def load_distilled_meta(model_dir) -> dict:
    """The 'distilled' checkpoint's metadata alone — for cheap pre-restore
    validation (e.g. rejecting --guidance before paying the params load)."""
    from ldm3d_tpu.ckpt import CheckpointManager, StageArtifacts

    u_ckpt = CheckpointManager(model_dir, StageArtifacts.DIFFUSION)
    if not u_ckpt.exists("distilled"):
        raise FileNotFoundError("no 'distilled' checkpoint found; run "
                                "ldm3d-distill first")
    return u_ckpt.load_meta("distilled")


def load_distilled(model_dir, template_params, sched_cfg: dict, sharding=None):
    """Restore the progressively-distilled student (``cli.distill``) and its
    few-step GridDDIM schedule from the 'distilled' checkpoint role.

    The ONE place that knows the distilled-checkpoint meta contract
    (timesteps / prediction_type / scale_factor) — the inference CLI and the
    model server both load through here. Returns ``(params, scheduler,
    meta)``; read ``meta['scale_factor']`` for the latent scale."""
    from ldm3d_tpu.ckpt import CheckpointManager, StageArtifacts
    from ldm3d_tpu.diffusion import GridDDIMScheduler

    u_ckpt = CheckpointManager(model_dir, StageArtifacts.DIFFUSION)
    if not u_ckpt.exists("distilled"):
        raise FileNotFoundError("no 'distilled' checkpoint found; run "
                                "ldm3d-distill first")
    params = u_ckpt.restore_params("distilled", template_params, sharding=sharding)
    meta = u_ckpt.load_meta("distilled")
    scheduler = GridDDIMScheduler.create(
        timesteps=meta["timesteps"],
        num_train_timesteps=sched_cfg["num_train_timesteps"],
        schedule=sched_cfg.get("schedule", "scaled_linear_beta"),
        beta_start=sched_cfg["beta_start"], beta_end=sched_cfg["beta_end"],
        prediction_type=meta.get("prediction_type", sched_cfg["prediction_type"]))
    return params, scheduler, meta


# the one sampler-name registry: CLIs, serving validation, and the
# dispatcher below all share it (a new sampler is added HERE plus one
# branch in make_sampling_scheduler)
SAMPLERS = ("ddpm", "ddim", "dpm", "dpm3")

# the one grid-spacing registry, same role as SAMPLERS: argparse choices and
# serving validation all share it (a new spacing is added HERE plus its
# handling in diffusion.schedulers / make_sampling_scheduler)
TIMESTEP_SPACINGS = ("leading", "trailing", "karras")


def make_sampling_scheduler(name: str, steps: int | None, sched_cfg: dict,
                            timestep_spacing: str | None = None):
    """ddpm (full-loop parity) / ddim (fast) / dpm (DPM-Solver++ 2M) /
    dpm3 (DPM-Solver++ 3M, third-order).

    ``steps=None`` uses each sampler's default: ddim/dpm/dpm3 50, ddpm the
    FULL training schedule (reference parity). An explicit ``steps`` is
    honored by every sampler — for ddpm by subsampling the schedule exactly
    like MONAI's ``DDPMScheduler.set_timesteps`` (strided ancestral steps).
    ``timestep_spacing`` overrides the config's ``NoiseScheduler`` value
    (the ``--timestep-spacing`` CLI flag). ``"karras"`` spacing (EDM
    sigma-spaced grids) is available on ddim (via an explicit-grid DDIM) and
    dpm/dpm3; the ancestral ddpm sampler's strided posterior math assumes a
    uniform grid, so it rejects karras."""
    from ldm3d_tpu.diffusion import (DDIMScheduler, DDPMScheduler, DPMSolverPPScheduler,
                                     GridDDIMScheduler, karras_timestep_grid)

    spacing = timestep_spacing or sched_cfg.get("timestep_spacing", "leading")
    common = dict(num_train_timesteps=sched_cfg["num_train_timesteps"],
                  schedule=sched_cfg.get("schedule", "scaled_linear_beta"),
                  beta_start=sched_cfg["beta_start"],
                  beta_end=sched_cfg["beta_end"], prediction_type=sched_cfg["prediction_type"],
                  timestep_spacing=spacing)
    if steps is None:
        steps = default_sampler_steps(name, sched_cfg)
    if name in ("dpm", "dpm3"):
        return DPMSolverPPScheduler.create(
            num_inference_steps=steps, solver_order=3 if name == "dpm3" else 2, **common)
    if name == "ddim":
        if spacing == "karras":
            grid = karras_timestep_grid(
                common["num_train_timesteps"], steps, common["schedule"],
                common["beta_start"], common["beta_end"])
            return GridDDIMScheduler.create(
                grid, num_train_timesteps=common["num_train_timesteps"],
                schedule=common["schedule"], beta_start=common["beta_start"],
                beta_end=common["beta_end"], prediction_type=common["prediction_type"])
        return DDIMScheduler.create(num_inference_steps=steps, **common)
    if name == "ddpm":
        if spacing == "karras":
            raise ValueError("karras timestep_spacing is not available on the "
                             "ancestral ddpm sampler; use ddim, dpm, or dpm3")
        n_train = sched_cfg["num_train_timesteps"]
        return DDPMScheduler.create(
            num_inference_steps=None if steps in (None, n_train) else steps, **common)
    raise ValueError(f"unknown sampler '{name}'")


def default_sampler_steps(name: str, sched_cfg: dict) -> int:
    """Concrete step count ``make_sampling_scheduler(name, None, cfg)`` runs."""
    n_train = sched_cfg["num_train_timesteps"]
    return n_train if name == "ddpm" else min(50, n_train)


# full-batch decode is faster ON DEVICE (batch-8: 200 ms / MFU 0.40 vs 274 ms
# / 0.33 for 8 chunk-1 programs — BENCH_r03, docs/PERFORMANCE.md), but chunk-1
# readbacks overlap the next batch's compute, which wins end-to-end when the
# device->host link is slow. 1 GB/s separates the regimes comfortably:
# production PCIe is >=8 GB/s, the dev tunnel ~0.06-0.08 GB/s.
READBACK_FAST_GBPS = 1.0


def probe_readback_gbps(nbytes: int = 16 << 20) -> float:
    """Measured device->host transfer rate, GB/s (one warm readback, timed)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jax.device_put(jnp.zeros((nbytes // 4,), jnp.float32))
    np.asarray(x)  # warm: allocation + first-transfer setup
    t0 = time.perf_counter()
    np.asarray(x)
    return nbytes / max(time.perf_counter() - t0, 1e-9) / 1e9


def resolve_decode_chunk(value, logger=None) -> int:
    """``--decode-chunk`` value -> concrete chunk size.

    Ints pass through (0 = whole batch). ``'auto'`` probes the readback rate
    and picks the regime: whole batch on fast links (the faster device
    program), chunk 1 on slow ones (readback overlap dominates).
    """
    if value != "auto":
        return max(0, int(value))
    gbps = probe_readback_gbps()
    chunk = 0 if gbps >= READBACK_FAST_GBPS else 1
    if logger is not None:
        logger.info("decode-chunk auto: readback %.2f GB/s -> %s",
                    gbps, "whole batch" if chunk == 0 else "chunk 1")
    return chunk
