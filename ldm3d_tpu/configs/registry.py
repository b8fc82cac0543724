"""Registry mapping config ``_target_`` class paths to TPU-native constructors.

The reference configs name torch/MONAI classes (e.g.
``monai.networks.nets.AutoencoderKL`` in ``config/config_train_32g.json:8``,
and the stale local ``networks.AutoencoderKL`` in ``config_train_16g.json:8``).
To keep those config files working verbatim, every alias resolves to the
corresponding Flax module here. Constructors accept the reference's keyword
surface (``spatial_dims``, ``in_channels``, ``channels``, ...).
"""

from __future__ import annotations

from typing import Callable, Mapping

__all__ = ["default_registry", "register"]

_EXTRA: dict[str, Callable] = {}


def register(name: str, ctor: Callable) -> None:
    """Register an additional ``_target_`` name (used by tests/extensions)."""
    _EXTRA[name] = ctor


def default_registry() -> Mapping[str, Callable]:
    # Imported lazily so the config layer stays importable without jax/flax.
    from ldm3d_tpu.nn.autoencoder_kl import AutoencoderKL
    from ldm3d_tpu.nn.diffusion_unet import DiffusionUNet3D
    from ldm3d_tpu.nn.discriminator import PatchDiscriminator3D

    def _autoencoder(**kw):
        return AutoencoderKL.from_config(**kw)

    def _unet(**kw):
        return DiffusionUNet3D.from_config(**kw)

    def _disc(**kw):
        return PatchDiscriminator3D.from_config(**kw)

    reg: dict[str, Callable] = {
        # our canonical names
        "ldm3d_tpu.nn.AutoencoderKL": _autoencoder,
        "ldm3d_tpu.nn.DiffusionUNet3D": _unet,
        "ldm3d_tpu.nn.PatchDiscriminator3D": _disc,
        # reference config aliases (monai class paths)
        "monai.networks.nets.AutoencoderKL": _autoencoder,
        "monai.networks.nets.DiffusionModelUNet": _unet,
        "monai.networks.nets.PatchDiscriminator": _disc,
        # stale alias used by the reference's config_train_16g.json:8,40
        "networks.AutoencoderKL": _autoencoder,
        "networks.DiffusionModelUNet": _unet,
    }
    reg.update(_EXTRA)
    return reg
