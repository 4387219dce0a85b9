from sinnerf_tpu.losses.photometric import (
    MSE_LOSS,
    L2_SSIM_LOSS,
    loss_dict,
    mse_loss,
    l2_ssim_loss,
    l2_vgg_loss,
)
from sinnerf_tpu.losses.depth import (
    inverse_depth_smoothness_loss,
    smooth_l1,
    smooth_l1_masked,
)
from sinnerf_tpu.losses.gan import (
    d_loss,
    g_loss,
    gan_bce_loss,
    gan_ls_loss,
)

__all__ = [
    "MSE_LOSS",
    "L2_SSIM_LOSS",
    "loss_dict",
    "mse_loss",
    "l2_ssim_loss",
    "l2_vgg_loss",
    "inverse_depth_smoothness_loss",
    "smooth_l1",
    "smooth_l1_masked",
    "d_loss",
    "g_loss",
    "gan_bce_loss",
    "gan_ls_loss",
]
