"""Export TPU-trained checkpoints back to reference-style torch state_dicts.

The inverse of :mod:`ldm3d_tpu.cli.import_checkpoint`: converts our orbax
"best" artifacts into ``torch.save``-format ``.pt`` files whose tensors are
laid out in the reference's module-REGISTRATION ORDER with the reference's
transposes (OIDHW convs, (out,in) linears; split ``to_q/to_k/to_v`` attention
by default, ``--fused-qkv`` for the SABlock layout).

Key naming: tensors keep OUR path names — torch's ``load_state_dict`` matches
by name, and MONAI's names vary across versions, so we don't guess them.
Loading into a MONAI model is a one-liner because the ORDER matches its
registration order exactly (that's the same contract our importer reads by):

    ref_sd  = model.state_dict()            # target MONAI model
    ours    = torch.load("out_ae.pt")
    model.load_state_dict({k: v for k, v in zip(ref_sd, ours.values())})

(Use ``--fused-qkv`` iff the target MONAI version fuses qkv, so tensor counts
line up.) Round-trip through our importer is exact (tests/test_import_torch.py).

Usage:
  python -m ldm3d_tpu.cli.export_checkpoint -c CFG -e ENV \\
      [--autoencoder out_ae.pt] [--diffusion out_unet.pt] [--fused-qkv] [--use-ema]
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from ldm3d_tpu.ckpt import CheckpointManager, StageArtifacts
from ldm3d_tpu.ckpt.import_torch import (
    autoencoder_manifest,
    export_torch_state_dict,
    unet_manifest,
)
from ldm3d_tpu.cli.common import build_parser, model_dtype, setup
from ldm3d_tpu.configs import define_instance
from ldm3d_tpu.parallel import replicated_sharding

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
    dt = model_dtype(args)
    rng = jax.random.PRNGKey(0)
    rep = replicated_sharding(mesh)
    patch = args.diffusion_train["patch_size"]
    qkv_mode = "fused" if args.fused_qkv else "split"

    import torch

    # torch has no bfloat16 numpy bridge; state_dicts are fp32 like the ref's
    def to_f32(tree):
        return jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), tree)

    ae = define_instance(args, "autoencoder_def").clone(dtype=dt)

    if args.autoencoder:
        g_vars = jax.jit(ae.init)({"params": rng, "sample": rng},
                                  jnp.zeros((1, *patch, args.image_channels), dt))
        ae_params = to_f32(CheckpointManager(args.model_dir, StageArtifacts.AUTOENCODER)
                           .restore_params("best", g_vars["params"], sharding=rep))
        sd = export_torch_state_dict(autoencoder_manifest(ae_params), ae_params, qkv_mode)
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, args.autoencoder)
        log.info("wrote %s (%d tensors)", args.autoencoder, len(sd))

    if args.diffusion:
        unet = define_instance(args, "diffusion_def").clone(dtype=dt)
        latent = [p // ae.downsample_factor for p in patch]
        u_vars = jax.jit(unet.init)(rng, jnp.zeros((1, *latent, unet.in_channels), dt),
                                    jnp.zeros((1,), jnp.int32))
        u_ckpt = CheckpointManager(args.model_dir, StageArtifacts.DIFFUSION)
        role = "ema" if args.use_ema else "best"
        if args.use_ema and not u_ckpt.exists("ema"):
            raise FileNotFoundError("no 'ema' checkpoint found; train with --ema-decay first")
        u_params = to_f32(u_ckpt.restore_params(role, u_vars["params"], sharding=rep))
        scale_factor = float(u_ckpt.load_meta("best").get("scale_factor", 1.0))
        sd = export_torch_state_dict(unet_manifest(u_params), u_params, qkv_mode)
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, args.diffusion)
        log.info("wrote %s (%d tensors; note: the reference never persists "
                 "scale_factor=%.6f — record it for torch-side sampling)",
                 args.diffusion, len(sd), scale_factor)


from ldm3d_tpu.cli.common import script_entry

script_main = script_entry(main)


if __name__ == "__main__":
    main()
