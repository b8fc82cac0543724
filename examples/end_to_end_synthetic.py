"""End-to-end walkthrough on synthetic data — runs on CPU in a few minutes.

Demonstrates the full two-stage workflow a reference user would follow
(train VAE-GAN -> train conditional LDM -> sample -> evaluate), on generated
paired volumes so no dataset is needed:

    python examples/end_to_end_synthetic.py --workdir /tmp/ldm3d_demo

On a TPU host, drop the JAX_PLATFORMS pin below to run on the chip; flags
like --amp / --batch / --spatial / --tensor compose exactly as in the
production CLIs (docs/SCALING.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# CPU by default so the demo runs anywhere, even on dev machines whose
# sitecustomize pre-pins another platform; LDM3D_DEMO_PLATFORM=tpu opts into
# real hardware.
_platform = os.environ.get("LDM3D_DEMO_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform

import jax

jax.config.update("jax_platforms", _platform)

# allow running from a source tree without pip-installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="/tmp/ldm3d_demo")
    p.add_argument("--epochs", type=int, default=2, help="epochs per stage")
    p.add_argument("--num", type=int, default=1, help="volumes to generate")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    env_path = os.path.join(args.workdir, "environment.json")
    with open(env_path, "w") as f:
        json.dump({
            "model_dir": os.path.join(args.workdir, "checkpoints"),
            "output_dir": os.path.join(args.workdir, "out"),
            "tfevent_path": os.path.join(args.workdir, "runs"),
            "resume_ckpt": False,
            "synthetic_data": True,
            "synthetic_num": 24,
            "seed": 42,
        }, f, indent=2)

    from ldm3d_tpu.configs import preset_path

    cfg = preset_path("config_tiny_cpu.json")
    base = ["-c", cfg, "-e", env_path, "--no-images",
            "--max-epochs", str(args.epochs)]

    print("== stage 1: VAE-GAN ==", flush=True)
    from ldm3d_tpu.cli.train_autoencoder import main as train_ae

    best_val = train_ae(base)
    print(f"stage-1 best val recon loss: {best_val:.4f}")

    print("== stage 2: conditional latent diffusion ==", flush=True)
    from ldm3d_tpu.cli.train_diffusion import main as train_diff

    train_diff(base)

    print("== sampling (DDIM-8) ==", flush=True)
    from ldm3d_tpu.cli.inference import main as infer

    infer(["-c", cfg, "-e", env_path, "--num", str(args.num),
           "--sampler", "ddim", "--steps", "8"])

    out_dir = os.path.join(args.workdir, "out")
    produced = sorted(os.listdir(out_dir))
    print(f"wrote {len(produced)} NIfTI volume(s) to {out_dir}:")
    for name in produced:
        print("  ", name)

    print("== evaluation (SSIM / PSNR / latent Frechet on val pairs) ==", flush=True)
    from ldm3d_tpu.cli.evaluate import main as evaluate

    evaluate(["-c", cfg, "-e", env_path, "--num", "4", "--steps", "4",
              "--sampler", "ddim"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
