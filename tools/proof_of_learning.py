"""Proof-of-learning run: the real two-stage pipeline, with committed evidence.

Round-4 verdict item 2: every perf number in the repo was throughput on random
weights; nothing demonstrated the framework actually LEARNS. This tool runs a
bounded two-stage training on the attached device using the SAME CLIs a user
runs (``cli.train_autoencoder`` -> ``cli.train_diffusion``, each as a
subprocess so device memory is stage-isolated), on the synthetic paired
low/high-count dataset, then commits the evidence the reference publishes as
images (``/root/reference/README.md:266-284``) — but with numbers attached:

  * ``scalars_stage{1,2}.jsonl``  — every TB scalar, exported
  * ``curves_stage{1,2}.png``     — loss curves (train + val)
  * ``metrics.json``              — trained vs UNTRAINED-floor eval metrics:
        stage 1: val-set reconstruction MS-SSIM / PSNR / MAE
        stage 2: conditional-sample composite score (evaluation.evaluator)
  * ``samples.png``               — tri-axial slices: low-count input,
        ground-truth high-count, trained conditional sample, untrained sample
  * ``summary.json``              — config, steps, wall time, NaN-event count
        (the north-star bf16-stability claim over a real horizon)

Usage (defaults give a ~1 h run on a v5e):
    python tools/proof_of_learning.py --outdir docs/artifacts/training_run_r5
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# validated reference palette (skill default): slot 1 blue, slot 2 orange
C_TRAIN = "#2a78d6"
C_VAL = "#eb6834"
C_TEXT = "#0b0b0b"
C_TEXT2 = "#52514e"
C_GRID = "#e4e3e0"
C_SURFACE = "#fcfcfb"


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--outdir", default="docs/artifacts/training_run_r5")
    p.add_argument("--workdir", default="/tmp/ldm3d_proof_r5")
    p.add_argument("--preset", default="config_train_32g.json")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--patch", type=int, default=64)
    p.add_argument("--synthetic-num", type=int, default=248)
    p.add_argument("--stage1-epochs", type=int, default=64)
    p.add_argument("--stage2-epochs", type=int, default=96)
    p.add_argument("--stage1-lr", type=float, default=1e-4)
    # measured on-chip: at 1e-4 the flagship (550M-param) UNet's zero-init
    # output conv bootstraps too slowly for a bounded run — per-step loss sat
    # at 1.0000 +/- 0.0005 for 900+ steps, while the same step at 1e-3
    # (tiny widths, CPU) drops 1.0 -> 0.33 in 100 steps
    p.add_argument("--stage2-lr", type=float, default=1e-3)
    p.add_argument("--val-interval", type=int, default=4)
    p.add_argument("--skip-stage1", action="store_true",
                   help="reuse an existing stage-1 checkpoint in workdir")
    p.add_argument("--skip-stage2", action="store_true")
    p.add_argument("--skip-train", action="store_true",
                   help="only re-run the export/eval steps on an existing workdir")
    p.add_argument("--eval-steps", type=int, default=50, help="DDIM steps for stage-2 eval sampling")
    p.add_argument("--eval-num", type=int, default=8, help="val pairs scored in stage-2 eval")
    p.add_argument("--ema-decay", type=float, default=0.999,
                   help="stage-2 EMA decay (0 disables; halves checkpoint transfer)")
    return p.parse_args()


def write_run_config(a) -> tuple[str, str]:
    from ldm3d_tpu.configs import load_json, preset_path

    cfg = load_json(preset_path(a.preset))
    cfg.setdefault("autoencoder_train", {})
    # lr raised from the preset's long-horizon values (5e-5 / 1e-5) so the
    # bounded run converges visibly within its few-thousand-step budget
    cfg["autoencoder_train"].update({
        "batch_size": a.batch, "patch_size": [a.patch] * 3, "lr": a.stage1_lr,
        "max_epochs": a.stage1_epochs, "val_interval": a.val_interval,
    })
    cfg.setdefault("diffusion_train", {})
    cfg["diffusion_train"].update({
        "batch_size": a.batch, "patch_size": [a.patch] * 3, "lr": a.stage2_lr,
        # stage-2 validates half as often: each is-best event pulls the
        # flagship UNet (params + EMA, ~GBs) over the dev tunnel — measured
        # ~7 min per save in the smoke run
        "max_epochs": a.stage2_epochs, "val_interval": 2 * a.val_interval,
    })
    cfg_path = os.path.join(a.workdir, "config_proof.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=2)
    env = {
        "data_base_dir": a.workdir,
        "model_dir": os.path.join(a.workdir, "checkpoints"),
        "output_dir": os.path.join(a.workdir, "results"),
        "resume_ckpt": False,
        "npz_dir_train": "", "npz_dir_val": "", "npz_dir": "",
        "val_fraction": 0.1,
        "tfevent_path": os.path.join(a.workdir, "runs"),
        "seed": 0,
        "synthetic_data": True,
        "synthetic_num": a.synthetic_num,
        # volumes sized so the 1.5x-rounded val patch (96^3 for patch 64) fits
        "synthetic_shape": [96, 96, 96],
    }
    env_path = os.path.join(a.workdir, "environment_proof.json")
    with open(env_path, "w") as f:
        json.dump(env, f, indent=2)
    return cfg_path, env_path


def run_stage(module: str, cfg: str, env: str, extra: list[str]) -> float:
    argv = [sys.executable, "-m", module, "-c", cfg, "-e", env, "--amp"] + extra
    print(f"[proof] running: {' '.join(argv)}", flush=True)
    t0 = time.time()
    # blocking checkpoint saves: async orbax pulls racing the train step's
    # transfers wedged the axon tunnel session twice during this run's
    # development (ckpt/manager.py docstring)
    senv = dict(os.environ, LDM3D_SYNC_SAVES="1")
    proc = subprocess.run(argv, cwd=REPO, env=senv)
    dt = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"{module} failed (rc={proc.returncode})")
    print(f"[proof] {module} done in {dt / 60:.1f} min", flush=True)
    return dt


# --------------------------------------------------------------------------
# TB scalar export + curves
# --------------------------------------------------------------------------

def export_scalars(logdir: str, out_jsonl: str) -> dict[str, list]:
    """All scalar tags from a tfevents dir (or the MetricsWriter JSONL
    fallback) -> {tag: [(step, value), ...]}, also written as JSONL."""
    tags: dict[str, list] = {}
    jl = os.path.join(logdir, "metrics.jsonl")
    if os.path.exists(jl):
        with open(jl) as f:
            for line in f:
                rec = json.loads(line)
                tags.setdefault(rec["tag"], []).append((rec["step"], rec["value"]))
    else:
        from tensorboard.backend.event_processing import event_accumulator

        acc = event_accumulator.EventAccumulator(
            logdir, size_guidance={event_accumulator.SCALARS: 0})
        acc.Reload()
        for tag in acc.Tags().get("scalars", []):
            tags[tag] = [(e.step, e.value) for e in acc.Scalars(tag)]
    with open(out_jsonl, "w") as f:
        for tag, pts in sorted(tags.items()):
            for step, val in pts:
                f.write(json.dumps({"tag": tag, "step": step, "value": val}) + "\n")
    return tags


def _style_axis(ax, title):
    ax.set_title(title, fontsize=10, color=C_TEXT, loc="left")
    ax.grid(True, color=C_GRID, linewidth=0.6)
    ax.set_facecolor(C_SURFACE)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(C_GRID)
    ax.tick_params(colors=C_TEXT2, labelsize=8)


def plot_curves(tags: dict, panels: list[tuple], out_png: str, suptitle: str):
    """panels: (title, [(tag, label, color, logy, xmul)]) — ``xmul`` converts
    each tag's recorded step counter to a COMMON x axis (training steps), so
    per-iter and per-epoch series share one scale (one-axis rule)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(panels)
    ncol = min(n, 2)
    nrow = math.ceil(n / ncol)
    fig, axes = plt.subplots(nrow, ncol, figsize=(5.4 * ncol, 3.2 * nrow))
    fig.patch.set_facecolor(C_SURFACE)
    axes = np.atleast_1d(axes).ravel()
    for ax in axes[n:]:
        ax.axis("off")
    for ax, (title, series) in zip(axes, panels):
        drawn = 0
        for tag, label, color, logy, xmul in series:
            pts = tags.get(tag)
            if not pts:
                continue
            steps, vals = zip(*sorted(pts))
            ax.plot(np.asarray(steps) * xmul, vals, color=color, linewidth=1.8,
                    label=label)
            if logy:
                ax.set_yscale("log")
            drawn += 1
        _style_axis(ax, title)
        ax.set_xlabel("training step", fontsize=8, color=C_TEXT2)
        if drawn >= 2:
            ax.legend(frameon=False, fontsize=8, labelcolor=C_TEXT2)
    fig.suptitle(suptitle, fontsize=11, color=C_TEXT, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    fig.savefig(out_png, dpi=140)
    plt.close(fig)
    print(f"[proof] wrote {out_png}", flush=True)


def count_nan_events(*tag_dicts) -> int:
    n = 0
    for tags in tag_dicts:
        for pts in tags.values():
            n += sum(1 for _, v in pts if not np.isfinite(v))
    return n


# --------------------------------------------------------------------------
# Eval: trained vs untrained floor, + sample figure
# --------------------------------------------------------------------------

def _val_batch(cfg_path: str, env_path: str, batch: int):
    """One deterministic val batch {image, label} at the stage-2 eval patch."""
    import argparse

    from ldm3d_tpu.data import prepare_dataloader
    from ldm3d_tpu.utils.config_merge import merge_configs_onto_args

    args = merge_configs_onto_args(argparse.Namespace(), env_path, cfg_path)
    args.synthetic_data = True
    patch = list(args.diffusion_train["patch_size"])
    _, val_loader = prepare_dataloader(args, batch, patch, randcrop=False,
                                       size_divisible=16, num_hosts=1, host_id=0)
    return next(iter(val_loader.epoch(0))), args


def eval_stage1(cfg_path, env_path, batch=4) -> dict:
    """Reconstruction metrics on val data: trained params vs untrained init."""
    import jax
    import jax.numpy as jnp

    from ldm3d_tpu.ckpt import CheckpointManager, StageArtifacts
    from ldm3d_tpu.configs import define_instance
    from ldm3d_tpu.evaluation import metrics as M

    b, args = _val_batch(cfg_path, env_path, batch)
    x = jnp.asarray(b["image"], jnp.float32)
    ae = define_instance(args, "autoencoder_def").clone(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(123)
    init_params = jax.jit(ae.init)({"params": rng, "sample": rng},
                                   x[:1].astype(jnp.bfloat16))["params"]
    ckpt = CheckpointManager(args.model_dir, StageArtifacts.AUTOENCODER)
    trained_params = ckpt.restore_params("best", init_params)

    @jax.jit
    def recon(params, x):
        out, _, _ = ae.apply({"params": params}, x.astype(jnp.bfloat16),
                             rngs={"sample": jax.random.PRNGKey(0)})
        return out.astype(jnp.float32)

    def score(params):
        r = jnp.clip(recon(params, x), 0.0, 1.0)
        return {  # metrics are per-sample (B,); report batch means
            "ms_ssim": float(jnp.mean(M.ms_ssim3d(r, x))),
            "psnr": float(jnp.mean(M.psnr(r, x))),
            "mae": float(jnp.mean(M.mae(r, x))),
        }

    out = {"untrained_floor": score(init_params), "trained": score(trained_params)}
    print(f"[proof] stage-1 recon metrics: {json.dumps(out)}", flush=True)
    return out


def eval_stage2(cfg_path, env_path, a) -> tuple[dict, dict]:
    """Conditional-sample composite score, trained vs untrained UNet, plus the
    arrays for the sample figure. Uses the same scan-compiled sampler as
    cli.evaluate (DDIM --eval-steps) and the TRAINED VAE for decode in both
    arms, so the floor isolates what stage-2 learned."""
    import jax
    import jax.numpy as jnp

    from ldm3d_tpu.ckpt import CheckpointManager, StageArtifacts
    from ldm3d_tpu.configs import define_instance
    from ldm3d_tpu.diffusion import DDIMScheduler, DDPMScheduler, inferer
    from ldm3d_tpu.evaluation import metrics as M
    from ldm3d_tpu.evaluation.evaluator import composite_score

    b, args = _val_batch(cfg_path, env_path, a.eval_num)
    img = jnp.asarray(b["image"], jnp.float32)
    lab = jnp.asarray(b["label"], jnp.float32)

    ae = define_instance(args, "autoencoder_def").clone(dtype=jnp.bfloat16)
    unet = define_instance(args, "diffusion_def").clone(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(7)
    ae_init = jax.jit(ae.init)({"params": rng, "sample": rng},
                               img[:1].astype(jnp.bfloat16))["params"]
    ae_ckpt = CheckpointManager(args.model_dir, StageArtifacts.AUTOENCODER)
    ae_params = ae_ckpt.restore_params("best", ae_init)
    lat_shape = tuple(s // ae.downsample_factor for s in img.shape[1:4])
    u_init = jax.jit(unet.init)(
        rng, jnp.zeros((1, *lat_shape, unet.in_channels), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32))["params"]
    u_ckpt = CheckpointManager(args.model_dir, StageArtifacts.DIFFUSION)
    u_params = u_ckpt.restore_params("best", u_init)
    scale_factor = float(u_ckpt.load_meta("best").get("scale_factor", 1.0))

    nsched = args.NoiseScheduler
    train_T = int(nsched.get("num_train_timesteps", 1000))
    ddim = DDIMScheduler.create(
        num_inference_steps=min(a.eval_steps, train_T), num_train_timesteps=train_T,
        beta_start=float(nsched.get("beta_start", 0.0015)),
        beta_end=float(nsched.get("beta_end", 0.0195)))

    @jax.jit
    def encode_cond(params, x):
        # condition latents are concatenated UNSCALED, matching training
        # (training/stage2.py module docstring)
        z = ae.apply({"params": params}, x.astype(jnp.bfloat16),
                     method="encode_stage_2_inputs",
                     rngs={"sample": jax.random.PRNGKey(1)})
        return z.astype(jnp.float32)

    cond = encode_cond(ae_params, img)
    noise = jax.random.normal(jax.random.PRNGKey(11), cond.shape, jnp.float32)

    def sample(uparams):
        def unet_apply(z, t):
            return unet.apply({"params": uparams}, z.astype(jnp.bfloat16), t)

        def decode(z):
            return ae.apply({"params": ae_params}, z.astype(jnp.bfloat16),
                            method="decode_stage_2_outputs")

        out = inferer.sample(unet_apply, decode, ddim, noise,
                             jax.random.PRNGKey(13), cond,
                             scale_factor=scale_factor)
        return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)

    def score(vol):
        ssim = float(jnp.mean(M.ssim3d(vol, lab)))
        psnr = float(jnp.mean(M.psnr(vol, lab)))
        mae = float(jnp.mean(M.mae(vol, lab)))
        return {"ssim": ssim, "psnr": psnr, "mae": mae,
                "composite": float(composite_score(ssim, psnr, mae))}

    trained_vol = sample(u_params)
    untrained_vol = sample(u_init)
    out = {"sampler": f"ddim-{a.eval_steps}",
           "trained": score(trained_vol),
           "untrained_floor": score(untrained_vol)}
    print(f"[proof] stage-2 sample metrics: {json.dumps(out)}", flush=True)
    arrays = {
        "input_low": np.asarray(img[0, ..., 0]),
        "ground_truth_high": np.asarray(lab[0, ..., 0]),
        "trained_sample": np.asarray(trained_vol[0, ..., 0]),
        "untrained_sample": np.asarray(untrained_vol[0, ..., 0]),
    }
    return out, arrays


def plot_samples(arrays: dict, out_png: str):
    """Tri-axial center slices, one row per volume (grayscale images)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ldm3d_tpu.obs import visualize_one_slice_in_3d_image

    rows = list(arrays.items())
    fig, axes = plt.subplots(len(rows), 3, figsize=(7.2, 2.4 * len(rows)))
    fig.patch.set_facecolor(C_SURFACE)
    for r, (name, vol) in enumerate(rows):
        for axis in range(3):
            ax = axes[r, axis]
            sl = np.asarray(visualize_one_slice_in_3d_image(vol, axis))[0]
            ax.imshow(sl, cmap="gray", vmin=0.0, vmax=1.0)
            ax.set_xticks([])
            ax.set_yticks([])
            for s in ax.spines.values():
                s.set_color(C_GRID)
            if axis == 0:
                ax.set_ylabel(name.replace("_", " "), fontsize=8, color=C_TEXT2)
            if r == 0:
                ax.set_title(f"axis {axis}", fontsize=9, color=C_TEXT2)
    fig.suptitle("Conditional samples vs ground truth (center slices)",
                 fontsize=11, color=C_TEXT, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    fig.savefig(out_png, dpi=140)
    plt.close(fig)
    print(f"[proof] wrote {out_png}", flush=True)


def main():
    a = build_args()
    os.makedirs(a.workdir, exist_ok=True)
    outdir = a.outdir if os.path.isabs(a.outdir) else os.path.join(REPO, a.outdir)
    os.makedirs(outdir, exist_ok=True)
    cfg_path, env_path = write_run_config(a)
    t_start = time.time()
    wall = {}

    if not (a.skip_train or a.skip_stage1):
        wall["stage1_seconds"] = run_stage(
            "ldm3d_tpu.cli.train_autoencoder", cfg_path, env_path, ["--remat", "convs"])
    if not (a.skip_train or a.skip_stage2):
        s2_flags = ["--cache-latents"]
        if a.ema_decay > 0:
            s2_flags += ["--ema-decay", str(a.ema_decay)]
        wall["stage2_seconds"] = run_stage(
            "ldm3d_tpu.cli.train_diffusion", cfg_path, env_path, s2_flags)

    # -- export curves -----------------------------------------------------
    runs = os.path.join(a.workdir, "runs")
    tags1 = export_scalars(os.path.join(runs, "autoencoder"),
                           os.path.join(outdir, "scalars_stage1.jsonl"))
    tags2 = export_scalars(os.path.join(runs, "diffusion"),
                           os.path.join(outdir, "scalars_stage2.jsonl"))
    # common x axis in true training steps: stage-1 logs per-iter tags every
    # 10 steps (x = counter -> x10) and per-epoch tags by epoch
    # (x = epoch -> x steps_per_epoch); stage-2 logs per-iter tags every step
    n_train_files = a.synthetic_num - max(1, int(a.synthetic_num * 0.1))
    spe = max(1, n_train_files // a.batch)
    plot_curves(tags1, [
        ("reconstruction L1", [("train_recon_loss_iter", "train", C_TRAIN, True, 10),
                               ("val_recon_loss", "val", C_VAL, True, spe)]),
        ("KL", [("train_kl_loss_iter", "train", C_TRAIN, True, 10)]),
        ("perceptual (2.5D LPIPS)", [("train_perceptual_loss_iter", "train", C_TRAIN, True, 10)]),
        ("adversarial (after warm-up)", [("train_adv_loss_iter", "train", C_TRAIN, False, 10)]),
    ], os.path.join(outdir, "curves_stage1.png"),
        "Stage 1 (VAE-GAN) — proof-of-learning run")
    plot_curves(tags2, [
        ("diffusion epsilon-MSE", [("train_diffusion_loss_iter", "train", C_TRAIN, True, 1),
                                   ("val_diffusion_loss", "val", C_VAL, True, spe)]),
    ], os.path.join(outdir, "curves_stage2.png"),
        "Stage 2 (conditional latent diffusion) — proof-of-learning run")

    # -- canonical evaluate CLI on the trained checkpoints -----------------
    ev_report = os.path.join(outdir, "eval_report_trained.json")
    run_stage("ldm3d_tpu.cli.evaluate", cfg_path, env_path,
              ["--synthetic-data", "-n", str(a.eval_num), "--sampler", "ddim",
               "--steps", str(a.eval_steps), "--batch", "4", "--report", ev_report])

    # -- eval vs untrained floor ------------------------------------------
    metrics = {"stage1_reconstruction": eval_stage1(cfg_path, env_path)}
    s2_metrics, arrays = eval_stage2(cfg_path, env_path, a)
    metrics["stage2_conditional_sampling"] = s2_metrics
    with open(os.path.join(outdir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    plot_samples(arrays, os.path.join(outdir, "samples.png"))

    nan_events = count_nan_events(tags1, tags2)
    summary = {
        "preset": a.preset,
        "patch": a.patch, "batch": a.batch,
        "synthetic_num": a.synthetic_num,
        "stage1_epochs": a.stage1_epochs, "stage2_epochs": a.stage2_epochs,
        "stage1_logged_points": sum(len(v) for v in tags1.values()),
        "stage2_logged_points": sum(len(v) for v in tags2.values()),
        "nan_events_in_all_logged_scalars": nan_events,
        "wall_seconds": wall,
        "total_wall_seconds": round(time.time() - t_start, 1),
        "device": None,
        "metrics": metrics,
    }
    try:
        import jax

        summary["device"] = str(jax.devices()[0])
    except Exception:  # noqa: BLE001
        pass
    with open(os.path.join(outdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"[proof] summary: nan_events={nan_events} "
          f"total_wall={summary['total_wall_seconds'] / 60:.1f} min", flush=True)
    assert nan_events == 0, "NaN events logged during training — bf16 stability claim violated"


if __name__ == "__main__":
    main()
