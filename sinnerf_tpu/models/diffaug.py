"""Differentiable GAN augmentations as pure PRNG-keyed functions.

Parity target: ``models/diff_aug.py`` (DiffAugment: brightness/saturation/
contrast, translation ±12.5%, cutout 50%), including the module-level 50%
skip (``diff_aug.py:14-15``).  All host-side ``np.random`` coin flips become
key-driven ``jnp.where`` selects so the whole thing lives inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rand_brightness(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    b = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) - 0.5
    return x + b


def rand_saturation(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    mean_c = jnp.mean(x, axis=1, keepdims=True)
    s = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) * 2.0
    return (x - mean_c) * s + mean_c


def rand_contrast(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    mean_all = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    c = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) + 0.5
    return (x - mean_all) * c + mean_all


def rand_translation(x: jnp.ndarray, key: jax.Array, ratio: float = 0.125) -> jnp.ndarray:
    """Per-sample integer shift of up to ±ratio, zero-padded (diff_aug.py:47-64)."""
    n, c, h, w = x.shape
    shift_h = int(h * ratio + 0.5)
    shift_w = int(w * ratio + 0.5)
    kh, kw = jax.random.split(key)
    th = jax.random.randint(kh, (n, 1, 1), -shift_h, shift_h + 1)
    tw = jax.random.randint(kw, (n, 1, 1), -shift_w, shift_w + 1)
    grid_h = jnp.arange(h)[None, :, None]
    grid_w = jnp.arange(w)[None, None, :]
    src_h = jnp.clip(grid_h + th + 1, 0, h + 1)  # indices into padded image
    src_w = jnp.clip(grid_w + tw + 1, 0, w + 1)
    x_pad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    batch = jnp.arange(n)[:, None, None]
    # (N, H, W, C) gather then back to NCHW
    out = x_pad.transpose(0, 2, 3, 1)[batch, src_h, src_w]
    return out.transpose(0, 3, 1, 2)


def rand_cutout(x: jnp.ndarray, key: jax.Array, ratio: float = 0.5) -> jnp.ndarray:
    """Zero a random box of `ratio` side fraction per sample (diff_aug.py:67-86)."""
    n, c, h, w = x.shape
    cut_h = int(h * ratio + 0.5)
    cut_w = int(w * ratio + 0.5)
    kh, kw = jax.random.split(key)
    off_h = jax.random.randint(kh, (n, 1, 1), 0, h + (1 - cut_h % 2))
    off_w = jax.random.randint(kw, (n, 1, 1), 0, w + (1 - cut_w % 2))
    grid_h = jnp.arange(h)[None, :, None]
    grid_w = jnp.arange(w)[None, None, :]
    # box spans [off - cut/2, off + cut/2) clamped into the image
    lo_h = jnp.clip(off_h - cut_h // 2, 0, h - 1)
    hi_h = jnp.clip(off_h - cut_h // 2 + cut_h - 1, 0, h - 1)
    lo_w = jnp.clip(off_w - cut_w // 2, 0, w - 1)
    hi_w = jnp.clip(off_w - cut_w // 2 + cut_w - 1, 0, w - 1)
    inside = (
        (grid_h >= lo_h) & (grid_h <= hi_h) & (grid_w >= lo_w) & (grid_w <= hi_w)
    )
    mask = 1.0 - inside.astype(x.dtype)
    return x * mask[:, None, :, :]


AUGMENT_FNS = {
    "color": [rand_brightness, rand_saturation, rand_contrast],
    "translation": [rand_translation],
    "cutout": [rand_cutout],
}


def diff_augment(
    x: jnp.ndarray,
    key: jax.Array,
    policy: str = "color,cutout",
    skip_prob: float = 0.5,
) -> jnp.ndarray:
    """Apply the augmentation policy to (N, C, H, W) images.

    ``skip_prob`` reproduces the reference's module-level coin flip
    (``diff_aug.py:14``): with probability 0.5 the input passes through
    untouched.  Implemented as a where-select so shapes stay static.
    """
    if not policy:
        return x
    k_skip, key = jax.random.split(key)
    augmented = x
    for p in policy.split(","):
        for fn in AUGMENT_FNS[p]:
            key, sub = jax.random.split(key)
            augmented = fn(augmented, sub)
    if skip_prob <= 0.0:
        return augmented
    skip = jax.random.bernoulli(k_skip, skip_prob)
    return jnp.where(skip, x, augmented)
