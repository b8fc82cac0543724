"""CLI config merging with reference parity.

The reference flattens ``environment.json`` and ``config_train_*.json`` onto
the argparse namespace via ``setattr`` (reference ``3d_ldm/train_autoencoder.py:120-126``).
We keep that contract (later files win silently), but additionally validate a
small typed schema for the keys the trainers rely on, which the reference
never did (SURVEY.md section 5.6 lists "no schema validation" as a gap).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any


_REQUIRED_TRAIN_KEYS = {
    "autoencoder_train": ("batch_size", "patch_size", "lr", "kl_weight", "perceptual_weight", "max_epochs", "val_interval"),
    "diffusion_train": ("batch_size", "patch_size", "lr", "max_epochs", "val_interval"),
}


def merge_configs_onto_args(args: Any, environment_file: str, config_file: str, validate: bool = True) -> Any:
    """Merge env + config JSON files onto ``args`` (attributes win: env < config)."""
    with open(environment_file, "r") as f:
        env_dict = json.load(f)
    with open(config_file, "r") as f:
        config_dict = json.load(f)
    for k, v in env_dict.items():
        setattr(args, k, v)
    for k, v in config_dict.items():
        setattr(args, k, v)
    if validate:
        _validate(args, config_dict)
    return args


def _validate(args: Any, config_dict: dict) -> None:
    problems = []
    for section, keys in _REQUIRED_TRAIN_KEYS.items():
        sec = getattr(args, section, None)
        if sec is None:
            continue  # a config may legitimately define only one stage
        for key in keys:
            if key not in sec:
                problems.append(f"{section}.{key} missing")
    if "autoencoder_def" in config_dict:
        ae = config_dict["autoencoder_def"]
        for key in ("channels", "latent_channels"):
            if key not in ae:
                problems.append(f"autoencoder_def.{key} missing")
    if problems:
        raise ValueError("invalid config: " + "; ".join(problems))


@dataclasses.dataclass
class TrainContext:
    """Resolved, typed view of the merged config used by the trainers."""

    args: Any

    @property
    def seed(self) -> int:
        return int(getattr(self.args, "seed", 0))

    @property
    def model_dir(self) -> str:
        return self.args.model_dir

    @property
    def tfevent_path(self) -> str:
        return getattr(self.args, "tfevent_path", "./runs")

    @property
    def resume_ckpt(self) -> bool:
        return bool(getattr(self.args, "resume_ckpt", False))

    def scheduler_config(self) -> dict:
        # The "stable" reference preset omits the NoiseScheduler block; the
        # reference falls back to DDPMScheduler defaults in that case
        # (reference 3d_ldm/train_diffusion.py:140-145 would KeyError, but the
        # documented intent is scheduler defaults). We default explicitly.
        default = {"num_train_timesteps": 1000, "beta_start": 0.0015, "beta_end": 0.0195,
                   "prediction_type": "epsilon"}
        cfg = getattr(self.args, "NoiseScheduler", None) or default
        return {**default, **cfg}
