from ldm3d_tpu.nn.autoencoder_kl import AutoencoderKL, Decoder3D, Encoder3D
from ldm3d_tpu.nn.diffusion_unet import DiffusionUNet3D
from ldm3d_tpu.nn.discriminator import PatchDiscriminator3D
from ldm3d_tpu.nn.lpips import LPIPS, SqueezeNetFeatures, perceptual_loss_25d
from ldm3d_tpu.nn import blocks

__all__ = [
    "AutoencoderKL",
    "Decoder3D",
    "Encoder3D",
    "DiffusionUNet3D",
    "PatchDiscriminator3D",
    "LPIPS",
    "SqueezeNetFeatures",
    "perceptual_loss_25d",
    "blocks",
]
