from sinnerf_tpu.utils.metrics import dssim_loss, mse, psnr, ssim, ssim_map

__all__ = ["dssim_loss", "mse", "psnr", "ssim", "ssim_map"]
