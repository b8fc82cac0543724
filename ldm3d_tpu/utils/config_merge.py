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


def merge_configs_onto_args(args: Any, environment_file: str, config_file: str, validate: bool = True) -> Any:
    """Merge env + config JSON files onto ``args`` (attributes win: env < config).

    Both files are validated against the typed schema
    (:mod:`ldm3d_tpu.configs.schema`) BEFORE merging: unknown keys and type
    mismatches raise, so a misspelled key can never silently disable a loss
    term or shadow a CLI flag the way the reference's bare setattr merge
    could."""
    with open(environment_file, "r") as f:
        env_dict = json.load(f)
    with open(config_file, "r") as f:
        config_dict = json.load(f)
    if validate:
        from ldm3d_tpu.configs.schema import validate_config, validate_environment

        validate_environment(env_dict, source=environment_file)
        validate_config(config_dict, source=config_file)
    for k, v in env_dict.items():
        setattr(args, k, v)
    for k, v in config_dict.items():
        setattr(args, k, v)
    # Optional environment keys the drivers read as plain attributes: default
    # them so a minimal env.json (just model_dir) runs instead of raising
    # AttributeError. The reference's bundled environment.json always carries
    # these, but its schema never required them.
    for k, default in (("resume_ckpt", False), ("tfevent_path", "./runs"),
                       ("output_dir", "./output")):
        if not hasattr(args, k):
            setattr(args, k, default)
    return args


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
        default = {"num_train_timesteps": 1000, "schedule": "scaled_linear_beta",
                   "beta_start": 0.0015, "beta_end": 0.0195,
                   "prediction_type": "epsilon"}
        cfg = getattr(self.args, "NoiseScheduler", None) or default
        return {**default, **cfg}
