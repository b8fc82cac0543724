"""Import reference torch checkpoints into this framework's model_dir.

Migration path for users of the reference: bring the ``.pt`` state_dicts its
trainers wrote (``autoencoder.pt`` / ``discriminator.pt`` /
``diffusion_unet.pt``, reference ``train_autoencoder.py:629-647``,
``train_diffusion.py:291-305``) and this tool converts them into our orbax
"best" artifacts, after which inference / evaluation / serving / fine-tuning
run on TPU unchanged. See :mod:`ldm3d_tpu.ckpt.import_torch` for the
structural matching rules (registration-order pairing, NDHWC transposes,
q/k/v fusion).

The reference never persists the stage-2 latent ``scale_factor`` (its
inference silently uses 1.0 — SURVEY.md 2.4.3); pass ``--scale-factor`` with
the value logged during reference training, or re-derive it here from data
with ``--derive-scale-factor``.

Usage:
  python -m ldm3d_tpu.cli.import_checkpoint -c CFG -e ENV \\
      --autoencoder /path/autoencoder.pt [--discriminator d.pt] \\
      [--diffusion diffusion_unet.pt] [--scale-factor F | --derive-scale-factor] \\
      [--dump]
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from ldm3d_tpu.ckpt import CheckpointManager, StageArtifacts
from ldm3d_tpu.ckpt.import_torch import (
    autoencoder_manifest,
    assigned_to_tree,
    flatten_torch_state_dict,
    match_state_dict,
    sequential_manifest,
    unet_manifest,
)
from ldm3d_tpu.cli.common import build_parser, setup
from ldm3d_tpu.configs import define_instance

log = logging.getLogger("import_checkpoint")


def _load_torch(path: str):
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # older torch without weights_only
        return torch.load(path, map_location="cpu")


def _import_one(name: str, path: str, template_params, manifest_fn, dump: bool):
    manifest = manifest_fn(template_params)
    items = flatten_torch_state_dict(_load_torch(path))
    if dump:
        print(f"== {name}: our manifest ({len(manifest)} leaves) ==")
        for e in manifest:
            print(f"  {'/'.join(e.path)}  {e.kind}  {e.shape}")
        print(f"== {name}: torch state_dict ({len(items)} tensors) ==")
        for k, a in items:
            print(f"  {k}  {tuple(a.shape)}")
    assigned = match_state_dict(manifest, items)
    params = assigned_to_tree(template_params, assigned)
    log.info("%s: matched %d torch tensors onto %d leaves", name, len(items), len(manifest))
    return params


def main(argv=None):
    parser = build_parser("Import reference torch checkpoints")
    parser.add_argument("--autoencoder", default=None, help="path to autoencoder.pt")
    parser.add_argument("--discriminator", default=None, help="path to discriminator.pt")
    parser.add_argument("--diffusion", default=None, help="path to diffusion_unet.pt")
    parser.add_argument("--scale-factor", type=float, default=None,
                        help="stage-2 latent scale factor from reference training logs")
    parser.add_argument("--derive-scale-factor", action="store_true",
                        help="recompute 1/std(encode(labels)) from the training data")
    parser.add_argument("--dump", action="store_true",
                        help="print both manifests (debugging mismatches)")
    args = parser.parse_args(argv)
    args, mesh = setup(args)
    rng = jax.random.PRNGKey(0)
    patch = args.autoencoder_train["patch_size"]

    if not (args.autoencoder or args.discriminator or args.diffusion):
        parser.error("nothing to import: pass --autoencoder / --discriminator / --diffusion")
    if args.diffusion and not (args.autoencoder or args.scale_factor is not None
                               or args.derive_scale_factor):
        log.warning("importing a diffusion UNet without --scale-factor: the reference "
                    "does not persist it; sampling will use 1.0 unless provided")

    ae = define_instance(args, "autoencoder_def")
    ae_vars = jax.jit(ae.init)({"params": rng, "sample": rng},
                               jnp.zeros((1, *patch, args.image_channels)))
    ae_params = ae_vars["params"]

    if args.autoencoder:
        ae_params = _import_one("autoencoder", args.autoencoder, ae_params,
                                autoencoder_manifest, args.dump)
        mgr = CheckpointManager(args.model_dir, StageArtifacts.AUTOENCODER)
        mgr.save("best", {"params": ae_params}, meta={"imported_from": args.autoencoder})
        log.info("saved autoencoder 'best' artifact to %s", args.model_dir)

    if args.discriminator:
        disc = define_instance(args, "discriminator_def")
        d_vars = jax.jit(disc.init)(rng, jnp.zeros((1, *patch, args.image_channels)))
        d_params = _import_one("discriminator", args.discriminator, d_vars["params"],
                               sequential_manifest, args.dump)
        mgr = CheckpointManager(args.model_dir, StageArtifacts.DISCRIMINATOR)
        mgr.save("best", {"params": d_params}, meta={"imported_from": args.discriminator})
        log.info("saved discriminator 'best' artifact to %s", args.model_dir)

    if args.diffusion:
        unet = define_instance(args, "diffusion_def")
        latent = [p // ae.downsample_factor for p in args.diffusion_train["patch_size"]]
        u_vars = jax.jit(unet.init)(rng, jnp.zeros((1, *latent, unet.in_channels)),
                                    jnp.zeros((1,), jnp.int32))
        u_params = _import_one("diffusion", args.diffusion, u_vars["params"],
                               unet_manifest, args.dump)
        scale_factor = args.scale_factor
        if scale_factor is None and args.derive_scale_factor:
            from ldm3d_tpu.data import prepare_dataloader
            from ldm3d_tpu.training import compute_scale_factor

            if not args.autoencoder:
                # deriving from this process's ae_params would silently use a
                # RANDOM-init VAE; load the previously-imported 'best' instead
                ae_mgr = CheckpointManager(args.model_dir, StageArtifacts.AUTOENCODER)
                if not ae_mgr.exists("best"):
                    parser.error(
                        "--derive-scale-factor needs trained VAE weights: pass "
                        "--autoencoder in the same run, or import it first so "
                        f"{args.model_dir}/autoencoder/best exists")
                ae_params = ae_mgr.restore_params("best", ae_params)
                log.info("loaded existing autoencoder 'best' for scale-factor derivation")

            train_loader, _ = prepare_dataloader(
                args, 1, args.diffusion_train["patch_size"], randcrop=False,
                size_divisible=2 ** (len(args.autoencoder_def["channels"])
                                     + len(args.diffusion_def["channels"]) - 2))
            batch = next(iter(train_loader.epoch(0)))
            scale_factor = float(compute_scale_factor(
                ae, ae_params, jnp.clip(jnp.asarray(batch["label"]), 0, 1), rng))
            log.info("derived scale_factor %.6f from data", scale_factor)
        mgr = CheckpointManager(args.model_dir, StageArtifacts.DIFFUSION)
        mgr.save("best", {"params": u_params},
                 meta={"imported_from": args.diffusion,
                       "scale_factor": float(scale_factor if scale_factor else 1.0)})
        log.info("saved diffusion 'best' artifact to %s (scale_factor=%s)",
                 args.model_dir, scale_factor or 1.0)


from ldm3d_tpu.cli.common import script_entry

script_main = script_entry(main)


if __name__ == "__main__":
    main()
