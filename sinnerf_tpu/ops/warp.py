"""Depth-based forward warping as vectorized on-device scatters.

Parity targets (the reference has three near-identical warps):
* blender last-write warp — ``datasets/blender_ray_patch_1image_rot3d.py:103-150``
* LLFF painter's-algorithm (z-buffered) warp, a per-pixel **Python loop** over
  ~190k pixels — ``datasets/llff_ray_patch_1image_proj.py:144-166``
* DTU numpy painter's warp — ``datasets/dtu_proj.py:236-273``

TPU-first design: the painter's loop becomes a two-pass scatter —
``.at[idx].min`` builds the z-buffer, then winners are selected by comparing
each splat against the z-buffer value at its target and scattered with losers
redirected to a dump slot.  Runs in microseconds on device vs. minutes of
interpreted Python (SURVEY.md §3.5); identical results up to tie-breaking among
exactly-equal depths.

The non-z-buffered blender variant (numpy fancy assignment = last write wins)
is reproduced with the same machinery keyed on source ordinal instead of depth.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def project_pixels(
    depth_ref: jnp.ndarray,
    ref_proj: jnp.ndarray,
    src_proj: jnp.ndarray,
    eps: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project every reference pixel into the source view via its depth.

    depth_ref: (H, W); ref_proj/src_proj: (4, 4) pixel projection matrices
    (K composed with world-to-camera).  Returns (x_src, y_src, depth_src),
    each (H, W).  Matches ``project_with_depth`` (blender_rot3d.py:103-126)
    with the optional ``+eps`` divide guard of the LLFF variant
    (llff_proj.py:136).
    """
    h, w = depth_ref.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=depth_ref.dtype),
        jnp.arange(w, dtype=depth_ref.dtype),
        indexing="ij",
    )
    d = depth_ref.reshape(-1)
    pts = jnp.stack(
        [xx.reshape(-1) * d, yy.reshape(-1) * d, d, jnp.ones_like(d)], axis=0
    )  # (4, H*W)
    rel = src_proj @ jnp.linalg.inv(ref_proj)
    x_src_h = rel @ pts  # (4, H*W)
    depth_src = x_src_h[2]
    x_src = x_src_h[0] / (depth_src + eps)
    y_src = x_src_h[1] / (depth_src + eps)
    return (
        x_src.reshape(h, w),
        y_src.reshape(h, w),
        depth_src.reshape(h, w),
    )


@partial(jax.jit, static_argnames=("zbuffer",))
def forward_warp(
    data: jnp.ndarray,
    depth_ref: jnp.ndarray,
    ref_proj: jnp.ndarray,
    src_proj: jnp.ndarray,
    zbuffer: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-warp ``data`` (H, W, C) from the reference view into the source
    view using the reference depth map.

    Returns (warped (H, W, C), warped_depth (H, W)); unwritten pixels are 0.

    ``zbuffer=True`` resolves collisions by nearest depth (LLFF/DTU painter
    semantics); ``zbuffer=False`` keeps the last-written source pixel
    (blender fancy-assignment semantics, where "last" = largest source
    ordinal in row-major order).
    """
    h, w = depth_ref.shape
    n = h * w
    x_src, y_src, depth_src = project_pixels(depth_ref, ref_proj, src_proj)

    # floor + clamp to the image, matching np.floor/np.clip in all reference
    # variants (blender_rot3d.py:141-147, llff_proj.py:155-156).
    tx = jnp.clip(jnp.floor(x_src), 0, w - 1).astype(jnp.int32).reshape(-1)
    ty = jnp.clip(jnp.floor(y_src), 0, h - 1).astype(jnp.int32).reshape(-1)
    flat = ty * w + tx  # (N,)
    d_flat = depth_src.reshape(-1)
    vals = data.reshape(n, -1)

    if zbuffer:
        # The painter's loop treats an existing depth of 0 as "empty", so a
        # zero-depth splat never occludes anything; exclude non-positive
        # depths from the z-buffer entirely.
        key = jnp.where(d_flat > 0, d_flat, jnp.inf)
        best = (
            jnp.full((n,), jnp.inf, dtype=key.dtype).at[flat].min(key)
        )
        winner = (key == best[flat]) & (d_flat > 0)
    else:
        ordinal = jnp.arange(n, dtype=jnp.int32)
        best = jnp.full((n,), -1, dtype=jnp.int32).at[flat].max(ordinal)
        winner = ordinal == best[flat]

    # Scatter winners; losers go to a dump slot n.
    idx = jnp.where(winner, flat, n)
    out = jnp.zeros((n + 1, vals.shape[-1]), vals.dtype).at[idx].set(vals)[:n]
    out_depth = jnp.zeros((n + 1,), d_flat.dtype).at[idx].set(d_flat)[:n]
    return out.reshape(h, w, -1), out_depth.reshape(h, w)


def warp_valid_mask(warped_rgb: jnp.ndarray) -> jnp.ndarray:
    """The reference's hole mask: a warped pixel is valid iff its RGB sum is
    nonzero (blender_rot3d.py:402, llff_proj.py:563, dtu_proj.py:546)."""
    return jnp.sum(warped_rgb, axis=-1) != 0
