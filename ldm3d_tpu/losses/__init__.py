from ldm3d_tpu.losses.losses import (
    l1_loss,
    l2_loss,
    kl_loss,
    kl_loss_sum,
    l1_loss_sum,
    l2_loss_sum,
    lsgan_generator_loss,
    lsgan_discriminator_loss,
)

__all__ = [
    "l1_loss",
    "l2_loss",
    "kl_loss",
    "kl_loss_sum",
    "l1_loss_sum",
    "l2_loss_sum",
    "lsgan_generator_loss",
    "lsgan_discriminator_loss",
]
