"""Depth supervision losses.

Parity targets:
* ``SL1Loss`` masked SmoothL1 — ``models/sinnerf.py:32-42``
* kornia ``inverse_depth_smoothness_loss`` — used at ``models/sinnerf.py:370-373``

The reference's boolean-mask indexing (``depth_pred[mask]``) is not jittable;
masked means are computed as weighted sums with an empty-mask guard (the
reference NaNs on an empty mask except for the side-depth guard at
``sinnerf.py:400`` — we guard everywhere).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise SmoothL1 (huber), torch semantics: 0.5*x^2/beta for |x|<beta
    else |x|-0.5*beta."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)


def smooth_l1_masked(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    use_mask: bool = True,
) -> jnp.ndarray:
    """Mean SmoothL1 over masked elements (models/sinnerf.py:38-42).

    ``mask=None, use_mask=True`` defaults the mask to ``target > 0``.
    Returns 0 when the mask is empty.
    """
    if mask is None and use_mask:
        mask = target > 0
    loss = smooth_l1(pred, target)
    if mask is None:
        return jnp.mean(loss)
    m = mask.astype(loss.dtype)
    denom = jnp.sum(m)
    return jnp.where(denom > 0, jnp.sum(loss * m) / jnp.maximum(denom, 1.0), 0.0)


def smooth_l1_masked_per_item(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    use_mask: bool = True,
) -> jnp.ndarray:
    """DDP-exact batch semantics: per-item masked SmoothL1 mean, then mean
    over the batch axis (axis 0).

    The reference runs ``--batch_size 1`` per DDP rank, computes the masked
    mean on that rank's single item (``models/sinnerf.py:399-406`` — item
    ``[0][0]``, with the empty-mask skip at ``:400`` contributing 0), and DDP
    averages gradients across ranks.  Pooling the mask across a batch>1 (as
    ``smooth_l1_masked`` does) weights items by their mask counts and diverges
    from that; this variant reproduces mean-of-per-item-losses exactly, so an
    N-device data mesh with per-device batch 1 matches N reference DDP ranks.
    """
    if mask is None and use_mask:
        mask = target > 0
    loss = smooth_l1(pred, target)
    b = loss.shape[0]
    loss = loss.reshape(b, -1)
    if mask is None:
        return jnp.mean(loss)
    m = mask.reshape(b, -1).astype(loss.dtype)
    cnt = jnp.sum(m, axis=1)
    per_item = jnp.where(
        cnt > 0, jnp.sum(loss * m, axis=1) / jnp.maximum(cnt, 1.0), 0.0
    )
    return jnp.mean(per_item)


def inverse_depth_smoothness_loss(
    idepth: jnp.ndarray, image: jnp.ndarray
) -> jnp.ndarray:
    """Edge-aware smoothness on a (B, 1, H, W) depth-like map, weighted by
    (B, 3, H, W) image gradients.  Matches kornia's formulation:

        w_x = exp(-mean_c |dI/dx|);  loss = mean|d(idepth)/dx * w_x| + (y term)

    (The reference passes raw rendered depth as "idepth"; we keep the same
    call contract.)
    """
    didx = idepth[..., :, :-1] - idepth[..., :, 1:]
    didy = idepth[..., :-1, :] - idepth[..., 1:, :]
    imdx = image[..., :, :-1] - image[..., :, 1:]
    imdy = image[..., :-1, :] - image[..., 1:, :]
    wx = jnp.exp(-jnp.mean(jnp.abs(imdx), axis=-3, keepdims=True))
    wy = jnp.exp(-jnp.mean(jnp.abs(imdy), axis=-3, keepdims=True))
    return jnp.mean(jnp.abs(didx * wx)) + jnp.mean(jnp.abs(didy * wy))
