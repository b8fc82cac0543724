"""Shared test scaffolds: env.json payloads and untrained two-stage checkpoints.

Five test files (serving, cli_inference, ckpt, crash_recovery, preemption)
grew near-identical copies of "write a test env.json" and "save init-params
AE + UNet 'best' checkpoints"; this module is the single source for both.
Plain module (not conftest fixtures) so subprocess-driving tests can use the
same helpers without fixture plumbing.
"""

import json


def write_env_json(env_path, model_dir, out_root, **overrides):
    """Write the standard test env.json; returns its path as str.

    ``out_root`` hosts the output/tfevent dirs; keyword overrides add or
    replace keys (e.g. ``synthetic_data=True``, ``seed=7``).
    """
    payload = {
        "model_dir": str(model_dir),
        "output_dir": str(out_root / "out"),
        "tfevent_path": str(out_root / "runs"),
        "resume_ckpt": False,
        "npz_dir_train": "", "npz_dir_val": "", "npz_dir": "",
        "val_fraction": 0.25, "seed": 0,
    }
    payload.update(overrides)
    env_path.write_text(json.dumps(payload))
    return str(env_path)


def make_two_stage_checkpoints(root, conditional=True):
    """Save untrained (init-params) AE + UNet 'best' checkpoints from the
    ``config_tiny_cpu`` preset; returns ``(cfg_path, model_dir)`` as str.

    ``conditional=False`` rewrites the UNet to ``in_channels ==
    latent_channels`` (no concat conditioning) and writes the modified
    config next to the checkpoints.
    """
    import jax
    import jax.numpy as jnp

    from ldm3d_tpu.ckpt import CheckpointManager, StageArtifacts
    from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path

    cfg_path = preset_path("config_tiny_cpu.json")
    cfg = load_json(cfg_path)
    if not conditional:
        cfg["diffusion_def"]["in_channels"] = "@latent_channels"
        cfg_path = root / "config.json"
        cfg_path.write_text(json.dumps(cfg))
        cfg_path = str(cfg_path)

    r = ConfigResolver(cfg)
    rng = jax.random.PRNGKey(0)
    model_dir = root / "ckpts"
    ae = r.instantiate("autoencoder_def")
    ae_params = ae.init({"params": rng, "sample": rng},
                        jnp.zeros((1, 32, 32, 32, 1)))["params"]
    CheckpointManager(str(model_dir), StageArtifacts.AUTOENCODER).save(
        "best", {"params": ae_params}, meta={})
    unet = r.instantiate("diffusion_def")
    u_params = unet.init(rng, jnp.zeros((1, 8, 8, 8, unet.in_channels)),
                         jnp.zeros((1,), jnp.int32))["params"]
    CheckpointManager(str(model_dir), StageArtifacts.DIFFUSION).save(
        "best", {"params": u_params}, meta={"scale_factor": 1.0})
    return str(cfg_path), str(model_dir)
