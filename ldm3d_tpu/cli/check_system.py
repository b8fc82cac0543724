"""System advisor CLI: probe the TPU host and recommend a training config.

Capability parity with the reference's ``3d_ldm/check_system.py`` (GPU/RAM/
disk probing -> recommended settings -> ``config_optimized.json`` + launch
command, :15,131,195,241), reinterpreted for TPU:
  * probes jax devices (platform, kind, count, per-chip HBM when exposed),
    host RAM/disk/CPU via psutil,
  * recommends a preset + batch/patch sizing from per-chip HBM,
  * writes ``config_optimized.json`` and prints the launch command
    (single process per host — no torchrun).

Usage: python -m ldm3d_tpu.cli.check_system [--output config_optimized.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import psutil


def probe_devices() -> dict:
    try:
        import jax

        devices = jax.devices()
        per_chip_hbm = None
        stats = None
        try:
            stats = devices[0].memory_stats()
        except Exception:
            pass
        if stats:
            per_chip_hbm = stats.get("bytes_limit")
        return {
            "available": True,
            "platform": devices[0].platform,
            "device_kind": devices[0].device_kind,
            "num_devices": len(devices),
            "num_hosts": jax.process_count(),
            "per_chip_hbm_bytes": per_chip_hbm,
        }
    except Exception as e:  # pragma: no cover
        return {"available": False, "error": str(e)}


def probe_host() -> dict:
    vm = psutil.virtual_memory()
    du = shutil.disk_usage(os.getcwd())
    return {
        "cpu_count": psutil.cpu_count(),
        "ram_gb": round(vm.total / 2**30, 1),
        "ram_available_gb": round(vm.available / 2**30, 1),
        "disk_free_gb": round(du.free / 2**30, 1),
        "python": sys.version.split()[0],
    }


# ---------------------------------------------------------------------------
# Stage-1 peak-HBM model (round-3 verdict item 3: recommendations must carry
# a measured-or-modeled headroom figure — the no-remat batch-8 recipe "fits
# 16 GB" with ~zero margin and OOM'd the round-3 bench when ~2 GiB of other
# buffers were resident).
#
# peak(batch, patch, remat) = STATE + ACT_PER_VOXEL * batch * voxels * f(remat)
#
#   STATE: exact — fp32 params + 2 Adam moments for generator (22.17 M) and
#     discriminator (0.67 M) + frozen bf16 LPIPS (0.72 M), counted via
#     jax.eval_shape on the 32g preset = 0.26 GiB.
#   ACT_PER_VOXEL: calibrated against on-chip fit/OOM + throughput brackets
#     on the 16 GiB v5e (tools/hbm_probe.py, raw runs committed at
#     docs/artifacts/hbm_brackets_r4.jsonl; the axon backend exposes no
#     memory_stats, so the anchor is a bracket, not a gauge): batch 8 @64^3
#     no-remat runs healthy (319 ms) but OOMs with ~2 GiB of extra resident
#     buffers (round-3 bench) -> requested footprint in (14, 16) GiB; model
#     pins the MIDDLE at 15 GiB -> 7.04 KiB/voxel/volume. Batches 10/12
#     still "fit" only because XLA silently rematerializes under pressure
#     at +60-86% step time (docs/PERFORMANCE.md "HBM headroom, measured") —
#     which is WHY the headroom gate below exists.
#   f(remat): 1.0 no-remat; 0.38 convs (1/3 activations + the same
#     boundary tensors, docs/PERFORMANCE.md round-3 remat section); 0.27
#     full (block boundaries only).
_STAGE1_STATE_BYTES = int(0.26 * 2**30)
_STAGE1_ACT_BYTES_PER_VOXEL = 15 * 2**30 * 0.983 / (8 * 64 ** 3)  # minus state
_REMAT_ACT_FACTOR = {False: 1.0, "none": 1.0, "convs": 0.38, True: 0.27, "full": 0.27}


def estimate_stage1_peak_bytes(batch: int, patch, remat) -> int:
    voxels = 1
    for p in patch:
        voxels *= p
    return int(_STAGE1_STATE_BYTES
               + _STAGE1_ACT_BYTES_PER_VOXEL * batch * voxels
               * _REMAT_ACT_FACTOR[remat])


# recommend no-remat only when the modeled peak leaves at least this much of
# the chip free — below it, `--remat convs` (+9% step time, ~1/3 activation
# memory) is the robust recipe; the round-3 bench OOM is the cautionary tale
_MIN_HEADROOM = 0.20


def recommend_settings(dev: dict, host: dict) -> dict:
    """Map chip memory to a preset tier, analogous to the reference's
    8/16/32 GB GPU tiers (``check_system.py:131-193``) — but margin-aware:
    every recommendation carries its modeled peak HBM and headroom fraction,
    and no-remat is only advised with >= 20% headroom."""
    hbm_bytes = dev.get("per_chip_hbm_bytes") or 16 * 2**30
    hbm_gb = hbm_bytes / 2**30
    n = dev.get("num_devices", 1)
    if not dev.get("available"):
        return {"preset": "config_tiny_cpu.json", "amp": False, "batch_size": 1,
                "patch_size": [32, 32, 32], "notes": ["no accelerator found; CPU debug preset"]}
    if hbm_gb >= 24:
        preset, batch, patch = "config_train_32g.json", 2, [96, 96, 96]
    elif hbm_gb >= 12:
        # batch 8 keeps the MXU sublane quantum full (batches below 8 pad to
        # it); the remat decision below is what the 16 GiB tier hinges on
        preset, batch, patch = "config_train_32g.json", 8, [64, 64, 64]
    else:
        preset, batch, patch = "config_train_stable.json", 1, [48, 48, 48]
    # margin-aware remat choice: fastest recipe that keeps >= 20% headroom
    remat = False
    peak = estimate_stage1_peak_bytes(batch, patch, remat)
    headroom = 1 - peak / hbm_bytes
    if headroom < _MIN_HEADROOM:
        remat = "convs"
        peak = estimate_stage1_peak_bytes(batch, patch, remat)
        headroom = 1 - peak / hbm_bytes
    return {
        "preset": preset,
        "amp": True,  # bf16 is native on TPU; always recommended
        "batch_size": batch,
        "remat": remat,
        "patch_size": patch,
        "estimated_peak_hbm_gb": round(peak / 2**30, 2),
        "hbm_headroom_frac": round(headroom, 3),
        "headroom_basis": ("modeled: exact state bytes (jax.eval_shape) + "
                           "activation coefficient bracketed on-chip "
                           "(tools/hbm_probe.py; docs/PERFORMANCE.md round-4 "
                           "HBM section)"),
        "data_axis": n,
        "expected_scaling": f"~{n}x (ICI all-reduce overlaps backward; no host sync)",
        "notes": [
            f"{dev['device_kind']} x{n}, ~{hbm_gb:.0f} GB HBM/chip",
            f"stage 1: batch {batch} @{patch[0]}^3 with "
            f"{'--remat convs' if remat == 'convs' else 'no remat'} — modeled peak "
            f"{peak / 2**30:.1f} GiB of {hbm_gb:.0f} GB ({headroom:.0%} headroom); "
            "no-remat is only recommended with >=20% headroom (the zero-margin "
            "no-remat recipe OOM'd under ~2 GiB of extra resident buffers)",
            "bf16 compute with fp32 params; no loss scaler or NaN guards needed",
            "batch 8/chip: the TPU sublane quantum is 8, so batches below 8 "
            "pad to it — stage-1 measured 23-26 vol/s at batch 8 on one v5e vs "
            "6.8 at batch 2; '--remat convs' costs +9% step time for ~1/3 the "
            "activation memory (docs/PERFORMANCE.md)",
            "stage 2: --cache-latents --remat with batch 8/chip measured 5x the "
            "full-step training throughput (docs/PERFORMANCE.md)",
            "inference/serving: --batch 8 maximizes MXU utilization (~2x vol/s vs batch 2)",
        ] + ([
            f"multi-chip: a --batch divisible by {n} samples data-parallel over all "
            f"{n} chips; --zero shards optimizer memory 1/{n} at no cost; --fsdp "
            f"also shards the params/EMA when the training state itself won't fit",
        ] if n > 1 else []),
    }


def generate_config_file(rec: dict, out_path: str) -> None:
    from ldm3d_tpu.configs import load_json, preset_path
    from ldm3d_tpu.configs.schema import validate_config

    cfg = load_json(preset_path(rec["preset"]))
    cfg["autoencoder_train"]["batch_size"] = rec["batch_size"]
    cfg["autoencoder_train"]["patch_size"] = rec["patch_size"]
    # size stage 2 to the same tier: the preset's diffusion_train (e.g. the
    # 32g file's batch 20 @ 80^3) can exceed the HBM this tool just sized
    # for, and the LDM should train at the patch the VAE was trained on
    # (both recommended patches are divisible by the stage-2 factor 16)
    cfg["diffusion_train"]["batch_size"] = rec["batch_size"]
    cfg["diffusion_train"]["patch_size"] = rec["patch_size"]
    validate_config(cfg, source=out_path)  # never emit a config the CLIs reject
    with open(out_path, "w") as f:
        json.dump(cfg, f, indent=2)


def generate_launch_command(rec: dict) -> str:
    remat = rec.get("remat")
    remat_flag = "" if not remat else (
        " --remat" if remat in (True, "full") else f" --remat {remat}")
    return (
        f"python -m ldm3d_tpu.cli.train_autoencoder -c {rec.get('output', 'config_optimized.json')} "
        f"-e environment.json" + (" --amp" if rec.get("amp") else "") + remat_flag
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU system advisor")
    parser.add_argument("--output", default="config_optimized.json")
    parser.add_argument("--json", action="store_true", help="machine-readable output only")
    args = parser.parse_args(argv)

    dev = probe_devices()
    host = probe_host()
    rec = recommend_settings(dev, host)
    rec["output"] = args.output
    generate_config_file(rec, args.output)
    report = {"devices": dev, "host": host, "recommendation": rec,
              "launch_command": generate_launch_command(rec)}
    if args.json:
        print(json.dumps(report))
    else:
        print(json.dumps(report, indent=2))
        print(f"\nWrote optimized config to {args.output}")
        print(f"Launch: {report['launch_command']}")
    return report


from ldm3d_tpu.cli.common import script_entry

script_main = script_entry(main)


if __name__ == "__main__":
    main()
