"""Photometric reconstruction losses over render result dicts.

Parity target: ``losses.py:12-153`` of the reference — each loss consumes the
renderer's ``{'rgb_coarse', 'rgb_fine', ...}`` dict plus a target and returns a
dict with at least ``'tot'`` and ``'l2'`` entries.  Registry keys match
``opt.py:119-122``'s *working* choices (``mse``, ``l2_ssim``, ``l2_vgg`` —
the reference's ``ft``/``clip`` options crash there too and are not ported,
SURVEY.md §2 item 3).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp

from sinnerf_tpu.utils.metrics import dssim_loss

ResultDict = Dict[str, jnp.ndarray]
LossDict = Dict[str, jnp.ndarray]

# MonoDepth-derived SSIM/L2 mixing ratio (losses.py:109).
SSIM_RATIO = 2.8333
VGG_RATIO = 0.01  # losses.py:149


def mse_loss(inputs: ResultDict, targets: jnp.ndarray) -> LossDict:
    """coarse+fine L2 (losses.py:12-22)."""
    loss = jnp.mean((inputs["rgb_coarse"] - targets) ** 2)
    if "rgb_fine" in inputs:
        loss = loss + jnp.mean((inputs["rgb_fine"] - targets) ** 2)
    return {"tot": loss, "l2": loss}


def l2_ssim_loss(inputs: ResultDict, targets: jnp.ndarray) -> LossDict:
    """L2 + 2.8333 * window-11 DSSIM on the fine image (losses.py:94-109).
    Inputs must be (B, C, H, W) images for the SSIM term."""
    loss = jnp.mean((inputs["rgb_coarse"] - targets) ** 2)
    out = {"l2": loss}
    if "rgb_fine" in inputs:
        loss = loss + jnp.mean((inputs["rgb_fine"] - targets) ** 2)
        out["l2"] = loss
        ssim = dssim_loss(inputs["rgb_fine"], targets, window_size=11)
        out["ssim"] = ssim
        out["tot"] = loss + ssim * SSIM_RATIO
    else:
        out["tot"] = loss
    return out


def l2_vgg_loss(
    inputs: ResultDict,
    targets: jnp.ndarray,
    vgg_features: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> LossDict:
    """L2 + 0.01 * VGG16-relu4_3 L1 perceptual loss (losses.py:112-149).

    ``vgg_features`` maps (B, 3, 224, 224)-normalized images to feature maps;
    built by ``sinnerf_tpu.models.vgg.make_vgg_features`` from converted
    torchvision weights.  Without it, falls back to pure L2 (the reference
    requires a torchvision download at construction time; we make the
    dependency explicit instead).
    """
    loss = jnp.mean((inputs["rgb_coarse"] - targets) ** 2)
    out = {"l2": loss}
    if "rgb_fine" in inputs:
        loss = loss + jnp.mean((inputs["rgb_fine"] - targets) ** 2)
        out["l2"] = loss
    if vgg_features is not None and "rgb_fine" in inputs:
        from sinnerf_tpu.models.vgg import vgg_preprocess

        f_pred = vgg_features(vgg_preprocess(inputs["rgb_fine"]))
        f_gt = vgg_features(vgg_preprocess(targets))
        vgg = jnp.mean(jnp.abs(f_pred - f_gt))
        out["vgg"] = vgg
        out["tot"] = loss + vgg * VGG_RATIO
    else:
        out["tot"] = loss
    return out


MSE_LOSS = "mse"
L2_SSIM_LOSS = "l2_ssim"
L2_VGG_LOSS = "l2_vgg"

loss_dict: Dict[str, Callable[..., LossDict]] = {
    MSE_LOSS: mse_loss,
    L2_SSIM_LOSS: l2_ssim_loss,
    L2_VGG_LOSS: l2_vgg_loss,
}
