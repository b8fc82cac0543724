"""Export TPU-trained checkpoints back to reference-style torch state_dicts.

The inverse of :mod:`ldm3d_tpu.cli.import_checkpoint`: converts our orbax
"best" artifacts into ``torch.save``-format ``.pt`` files laid out in the
reference's module-registration order (MONAI layouts; split ``to_q/to_k/to_v``
attention by default, ``--fused-qkv`` for the SABlock layout), so models
trained here can move back to a torch/MONAI deployment. Round-tripping
through the importer is exact (tests/test_import_torch.py).

Usage:
  python -m ldm3d_tpu.cli.export_checkpoint -c CFG -e ENV \\
      [--autoencoder out_ae.pt] [--diffusion out_unet.pt] [--fused-qkv] [--use-ema]
"""

from __future__ import annotations

import logging

import jax

from ldm3d_tpu.ckpt.import_torch import (
    autoencoder_manifest,
    export_torch_state_dict,
    unet_manifest,
)
from ldm3d_tpu.cli.common import build_parser, load_two_stage, model_dtype, setup

log = logging.getLogger("export_checkpoint")


def main(argv=None):
    parser = build_parser("Export checkpoints to reference torch format")
    parser.add_argument("--autoencoder", default=None, help="output path for autoencoder.pt")
    parser.add_argument("--diffusion", default=None, help="output path for diffusion_unet.pt")
    parser.add_argument("--fused-qkv", action="store_true",
                        help="emit fused SABlock-style qkv tensors (default: split to_q/to_k/to_v)")
    parser.add_argument("--use-ema", action="store_true", help="export the EMA UNet weights")
    args = parser.parse_args(argv)
    if not (args.autoencoder or args.diffusion):
        parser.error("nothing to export: pass --autoencoder and/or --diffusion")
    args, mesh = setup(args)
    rng = jax.random.PRNGKey(0)

    import jax.numpy as jnp
    import torch

    ae, ae_params, unet, u_params, _, scale_factor = load_two_stage(
        args, mesh, model_dtype(args), rng, use_ema=args.use_ema)
    # torch has no bfloat16 numpy bridge; state_dicts are fp32 like the ref's
    to_f32 = lambda t: jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), t)  # noqa: E731
    ae_params, u_params = to_f32(ae_params), to_f32(u_params)
    qkv_mode = "fused" if args.fused_qkv else "split"

    if args.autoencoder:
        sd = export_torch_state_dict(autoencoder_manifest(ae_params), ae_params, qkv_mode)
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, args.autoencoder)
        log.info("wrote %s (%d tensors)", args.autoencoder, len(sd))
    if args.diffusion:
        sd = export_torch_state_dict(unet_manifest(u_params), u_params, qkv_mode)
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, args.diffusion)
        log.info("wrote %s (%d tensors; note: the reference never persists "
                 "scale_factor=%.6f — record it for torch-side sampling)",
                 args.diffusion, len(sd), scale_factor)


if __name__ == "__main__":
    main()
