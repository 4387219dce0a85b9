"""Image quality metrics: MSE / PSNR / SSIM.

Parity target: ``metrics.py:5-24`` of the reference (psnr = -10*log10(mse);
ssim = 1 - 2*dssim with kornia's window-3 gaussian SSIM) and the kornia
``ssim_loss`` (window 11) used by ``losses.py:105``.

The gaussian-window SSIM follows kornia's formulation: 2D gaussian filter
(sigma = 1.5), reflect padding, C1 = 0.01^2, C2 = 0.03^2 on a [0, 1] dynamic
range.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mse(
    image_pred: jnp.ndarray,
    image_gt: jnp.ndarray,
    valid_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    value = (image_pred - image_gt) ** 2
    if valid_mask is not None:
        mask = valid_mask.astype(value.dtype)
        return jnp.sum(value * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(value)


def psnr(
    image_pred: jnp.ndarray,
    image_gt: jnp.ndarray,
    valid_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``-10 * log10(mse)`` (metrics.py:14-15)."""
    return -10.0 * jnp.log10(mse(image_pred, image_gt, valid_mask))


def _gaussian_kernel(window_size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def _filter2d_same(img: jnp.ndarray, kernel1d: jnp.ndarray) -> jnp.ndarray:
    """Separable 2D gaussian filter with reflect padding.

    img: (B, C, H, W).  Depthwise (per-channel) filtering — two 1-D convs, so
    XLA maps them onto small MXU contractions instead of a KxK gather.
    """
    pad = kernel1d.shape[0] // 2
    b, c, h, w = img.shape
    x = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    kh = kernel1d.reshape(1, 1, -1, 1)
    kw = kernel1d.reshape(1, 1, 1, -1)
    x = jax.lax.conv_general_dilated(
        x.reshape(b * c, 1, h + 2 * pad, w + 2 * pad),
        kh,
        window_strides=(1, 1),
        padding="VALID",
    )
    x = jax.lax.conv_general_dilated(
        x, kw, window_strides=(1, 1), padding="VALID"
    )
    return x.reshape(b, c, h, w)


def ssim_map(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    c1: float = 0.01**2,
    c2: float = 0.03**2,
) -> jnp.ndarray:
    """Per-pixel SSIM map for (B, C, H, W) images in [0, 1]."""
    k = _gaussian_kernel(window_size, sigma)
    mu1 = _filter2d_same(img1, k)
    mu2 = _filter2d_same(img2, k)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d_same(img1 * img1, k) - mu1_sq
    sigma2_sq = _filter2d_same(img2 * img2, k) - mu2_sq
    sigma12 = _filter2d_same(img1 * img2, k) - mu12
    return ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )


def ssim(image_pred: jnp.ndarray, image_gt: jnp.ndarray, window_size: int = 3) -> jnp.ndarray:
    """Mean SSIM in [-1, 1], matching ``metrics.py:18-24``:
    ``1 - 2 * dssim`` where dssim = (1 - ssim_map)/2 -> this equals the plain
    mean SSIM."""
    return jnp.mean(ssim_map(image_pred, image_gt, window_size))


def dssim_loss(
    image_pred: jnp.ndarray, image_gt: jnp.ndarray, window_size: int = 11
) -> jnp.ndarray:
    """kornia ``ssim_loss``: mean of (1 - ssim_map) / 2 (losses.py:105)."""
    return jnp.mean((1.0 - ssim_map(image_pred, image_gt, window_size)) / 2.0)
