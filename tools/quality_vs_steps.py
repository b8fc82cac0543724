"""Quality-vs-steps table on a TRAINED checkpoint (round-4 verdict item 4).

The bench sells DPM-Solver++-20 (~2x) and distilled-4 (~3.6x) as fast-sampling
wins, but their throughput was measured on random weights, where quality is
undefined. This tool scores the fast samplers against DDIM-50 on the
proof-of-learning checkpoint (tools/proof_of_learning.py) with the canonical
``cli.evaluate`` gate metrics, re-distilling the student from the trained
teacher first — so the committed table pairs every speed claim with its
measured quality cost. The reference has no fast sampler at all
(``3d_ldm/inference.py:79-99``): this table is where "beating the reference"
becomes defensible end-to-end.

Usage (after proof_of_learning.py has populated --workdir):
    python tools/quality_vs_steps.py --workdir /tmp/ldm3d_proof_r5 \
        --outdir docs/artifacts/training_run_r5
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="/tmp/ldm3d_proof_r5")
    p.add_argument("--outdir", default="docs/artifacts/training_run_r5")
    p.add_argument("--eval-num", type=int, default=8)
    p.add_argument("--eval-batch", type=int, default=4)
    p.add_argument("--distill-teacher-steps", type=int, default=64)
    p.add_argument("--distill-rounds", type=int, default=4,
                   help="4 halvings of 64 -> a 4-step student grid")
    p.add_argument("--distill-steps-per-round", type=int, default=600)
    p.add_argument("--skip-distill", action="store_true",
                   help="reuse an existing 'distilled' checkpoint in workdir")
    return p.parse_args()


def run(module: str, cfg: str, env: str, extra: list[str]) -> float:
    argv = [sys.executable, "-m", module, "-c", cfg, "-e", env, "--amp"] + extra
    print(f"[qvs] running: {' '.join(argv)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(argv, cwd=REPO)
    if proc.returncode != 0:
        raise RuntimeError(f"{module} {extra} failed (rc={proc.returncode})")
    return time.time() - t0


def main():
    a = build_args()
    cfg = os.path.join(a.workdir, "config_proof.json")
    env = os.path.join(a.workdir, "environment_proof.json")
    for p in (cfg, env):
        if not os.path.exists(p):
            raise FileNotFoundError(f"{p} not found — run tools/proof_of_learning.py first")
    outdir = a.outdir if os.path.isabs(a.outdir) else os.path.join(REPO, a.outdir)
    os.makedirs(outdir, exist_ok=True)

    variants = [
        ("ddim-50", ["--sampler", "ddim", "--steps", "50"]),
        ("dpm-20", ["--sampler", "dpm", "--steps", "20"]),
        ("distilled-4", ["--use-distilled"]),
    ]
    if not a.skip_distill:
        run("ldm3d_tpu.cli.distill", cfg, env, [
            "--synthetic-data",
            "--teacher-steps", str(a.distill_teacher_steps),
            "--rounds", str(a.distill_rounds),
            "--steps-per-round", str(a.distill_steps_per_round),
        ])

    rows = {}
    for name, flags in variants:
        report = os.path.join(outdir, f"quality_{name.replace('-', '_')}.json")
        wall = run("ldm3d_tpu.cli.evaluate", cfg, env, [
            "--synthetic-data", "-n", str(a.eval_num), "--batch", str(a.eval_batch),
            "--report", report, *flags])
        with open(report) as f:
            rows[name] = {**json.load(f), "eval_wall_seconds": round(wall, 1)}

    base = rows["ddim-50"]
    table = {
        "note": ("composite/ssim/psnr from cli.evaluate on the proof-of-learning "
                 "checkpoint (synthetic paired data, conditional sampling); "
                 "throughput numbers for these samplers at the 96^3 headline "
                 "workload live in the bench artifact fields "
                 "dpm20_volumes_per_sec_chip / distilled_4step_volumes_per_sec_chip"),
        "distill": None if a.skip_distill else {
            "teacher_steps": a.distill_teacher_steps, "rounds": a.distill_rounds,
            "steps_per_round": a.distill_steps_per_round},
        "variants": {
            name: {
                "score": r.get("score"),
                "ssim": r.get("ssim"), "ms_ssim": r.get("ms_ssim"),
                "psnr": r.get("psnr"), "mae": r.get("mae"),
                "score_delta_vs_ddim50": (round(r["score"] - base["score"], 4)
                                          if r.get("score") is not None
                                          and base.get("score") is not None else None),
            } for name, r in rows.items()
        },
    }
    out = os.path.join(outdir, "quality_vs_steps.json")
    with open(out, "w") as f:
        json.dump(table, f, indent=2)
    print(json.dumps(table["variants"], indent=2))
    print(f"[qvs] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
