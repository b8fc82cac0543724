"""Calibrate the CI e2e quality-gate threshold from REAL variance.

Round-3 verdict weak item 6: the 0.12 gate threshold was derived from three
bitwise-identical fixed-seed runs — zero observed variance, so the margin
was a guess. This script produces an actual band, the same way
``tests/test_golden_numerics.py`` calibrated the kernel gate (healthy spread
+ a deliberately-broken run):

  * HEALTHY band: the full CI e2e recipe (1-epoch two-stage training on
    synthetic data -> DDIM-4 sampling -> evaluate composite) across N
    DIFFERENT seeds — seed changes the synthetic dataset, the training
    trajectory, and the sampling noise, so the spread is the real
    run-to-run variance of the pipeline, not a bitwise echo.
  * COLLAPSE floor: the same evaluation on UNTRAINED (init-parameter)
    checkpoints — the quality regression the gate exists to catch.

Prints one JSON line with the per-seed scores, spread, collapse score, and
a recommended threshold = midpoint of (min healthy, collapse), and writes
the raw record to ``docs/artifacts/e2e_gate_calibration.json`` for the
workflow comment to cite.

Run on CPU (the CI platform)::

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python tools/calibrate_e2e_gate.py --seeds 5
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))  # scaffolds for the collapse run

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def _write_env(path: str, model_dir: str, out_dir: str, seed: int) -> str:
    env = {
        "model_dir": model_dir, "output_dir": out_dir, "tfevent_path": out_dir,
        "resume_ckpt": False, "npz_dir_train": "", "npz_dir_val": "",
        "npz_dir": "", "val_fraction": 0.25, "seed": seed,
        "synthetic_data": True, "synthetic_num": 8,
    }
    with open(path, "w") as f:
        json.dump(env, f)
    return path


def _evaluate(cfg: str, env_path: str, model_dir: str) -> float:
    from ldm3d_tpu.cli.evaluate import main as eval_main

    eval_main(["-c", cfg, "-e", env_path, "-n", "2", "--sampler", "ddim",
               "--steps", "4", "--synthetic-data"])
    with open(os.path.join(model_dir, "evaluation_report.json")) as f:
        return float(json.load(f)["score"])


def run_healthy(cfg: str, seed: int, epochs: int = 1) -> float:
    """One full CI-recipe run (train both stages -> evaluate)."""
    from ldm3d_tpu.mlops.pipelines.training_pipeline import main as pipe_main

    root = tempfile.mkdtemp(prefix=f"gate_cal_s{seed}_")
    model_dir = os.path.join(root, "ckpts")
    env_path = _write_env(os.path.join(root, "env.json"), model_dir, root, seed)
    pipe_main(["-c", cfg, "-e", env_path, "--model-dir", model_dir,
               "--max-epochs", str(epochs), "--synthetic-data"])
    return _evaluate(cfg, env_path, model_dir)


def run_collapse(cfg: str) -> float:
    """Evaluate UNTRAINED init-parameter checkpoints — the failure the gate
    must catch (quality collapse with the pipeline still 'working')."""
    from pathlib import Path

    from scaffolds import make_two_stage_checkpoints

    root = Path(tempfile.mkdtemp(prefix="gate_cal_collapse_"))
    cfg_path, model_dir = make_two_stage_checkpoints(root, conditional=False)
    env_path = _write_env(str(root / "env.json"), str(model_dir), str(root), 0)
    return _evaluate(str(cfg_path), env_path, str(model_dir))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--config",
                    default="ldm3d_tpu/configs/presets/config_tiny_cpu.json")
    ap.add_argument("--out",
                    default="docs/artifacts/e2e_gate_calibration.json")
    ap.add_argument("--epochs", type=int, default=1,
                    help="training epochs per healthy run (CI recipe uses 1)")
    ap.add_argument("--healthy-scores", default=None,
                    help="comma-separated scores from a previous run: skip "
                         "re-running the healthy seeds, only run collapse")
    args = ap.parse_args(argv)

    import numpy as np

    cfg = os.path.join(REPO, args.config) if not os.path.isabs(args.config) else args.config

    if args.healthy_scores:
        healthy = [float(s) for s in args.healthy_scores.split(",")]
    else:
        healthy = []
        for seed in range(args.seeds):
            score = run_healthy(cfg, seed, args.epochs)
            healthy.append(score)
            print(f"[calibrate] seed {seed}: composite {score:.6f}", file=sys.stderr)
    collapse = run_collapse(cfg)
    print(f"[calibrate] collapse (untrained): {collapse:.6f}", file=sys.stderr)

    lo, hi = float(min(healthy)), float(max(healthy))
    std = float(np.std(healthy))
    if lo - collapse < std:
        # the midpoint recommendation below is NON-SEPARATING in this regime:
        # when the collapse score sits within ~1 std of the healthy minimum,
        # (lo+collapse)/2 has near-zero margin on both sides. Callers should
        # treat the gate as catastrophic-only (see ci.yml evaluation-gate
        # comment) rather than adopt the midpoint.
        print(
            f"[calibrate] WARNING: healthy_min - collapse = {lo - collapse:.4f} "
            f"< healthy_std = {std:.4f}: trained vs untrained are not separable "
            "at this scale; recommended_threshold is non-separating — keep a "
            "catastrophic-only threshold instead.",
            file=sys.stderr,
        )
    rec = {
        "healthy_scores": [round(s, 6) for s in healthy],
        "healthy_min": round(lo, 6),
        "healthy_max": round(hi, 6),
        "healthy_std": round(std, 6),
        "collapse_score": round(collapse, 6),
        # midpoint between the worst healthy run and the collapse floor:
        # symmetric margin against both false failures and missed collapse
        "recommended_threshold": round((lo + collapse) / 2, 4),
        "recipe": f"training_pipeline --max-epochs {args.epochs} + evaluate -n 2 ddim-4, "
                  "config_tiny_cpu, synthetic_num 8, seeds 0..N-1; collapse = "
                  "untrained init checkpoints (tests/scaffolds)",
    }
    out_path = os.path.join(REPO, args.out) if not os.path.isabs(args.out) else args.out
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
