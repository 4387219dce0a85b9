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
def warp_winner(
    depth_ref: jnp.ndarray,
    ref_proj: jnp.ndarray,
    src_proj: jnp.ndarray,
    zbuffer: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resolve the warp's splat collisions WITHOUT materializing values.

    Returns ``(win, d_flat)``: ``win`` (H*W,) int32 holds, per flattened
    target pixel, the row-major source ordinal whose splat wins (-1 if no
    splat lands there); ``d_flat`` (H*W,) is every source pixel's projected
    depth.  Callers reconstruct any per-pixel quantity q as
    ``where(win >= 0, q_flat[max(win, 0)], 0)`` — and, crucially, can gather
    ONLY the pixels they consume (the per-step training sampler reads a
    strided patch, not the full image).

    TPU rationale: the obvious formulation scatters the (N, C) values
    themselves, but an (N, 3) f32 scatter target is lane-padded to
    (N, 128) in HBM — the init memset and every scatter pass pay ~42x
    amplification.  Scattering 1-D ordinals keeps every pass unpadded.

    ``zbuffer=True`` resolves by nearest positive depth with FIRST-writer
    tie-break — exactly the reference painter's loops
    (llff_proj.py:144-166, dtu_proj.py:236-273: strict ``>`` keeps the
    incumbent on equal depth); a non-positive splat never wins (the loop
    treats existing depth 0 as "empty", so such a splat can't occlude).
    ``zbuffer=False`` keeps the last-written source pixel (blender
    fancy-assignment semantics, blender_rot3d.py:103-150, where "last" =
    largest source ordinal in row-major order).
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
    ordinal = jnp.arange(n, dtype=jnp.int32)

    if zbuffer:
        key = jnp.where(d_flat > 0, d_flat, jnp.inf)
        best = jnp.full((n,), jnp.inf, dtype=key.dtype).at[flat].min(key)
        winner = (key == best[flat]) & (d_flat > 0)
        # among equal-depth splats the painter keeps the FIRST writer
        cand = jnp.where(winner, ordinal, n)
        first = jnp.full((n,), n, jnp.int32).at[flat].min(cand)
        win = jnp.where(first < n, first, -1)
    else:
        win = jnp.full((n,), -1, jnp.int32).at[flat].max(ordinal)
    return win, d_flat


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
    Collision semantics per ``warp_winner``.
    """
    h, w = depth_ref.shape
    n = h * w
    win, d_flat = warp_winner(depth_ref, ref_proj, src_proj, zbuffer=zbuffer)
    valid = win >= 0
    src = jnp.maximum(win, 0)
    # one packed row gather instead of per-quantity value scatters
    packed = jnp.concatenate(
        [data.reshape(n, -1), d_flat[:, None].astype(data.dtype)], axis=-1
    )[src]
    out = jnp.where(valid[:, None], packed[:, :-1], 0)
    out_depth = jnp.where(valid, packed[:, -1], 0)
    return out.reshape(h, w, -1), out_depth.reshape(h, w)


def warp_valid_mask(warped_rgb: jnp.ndarray) -> jnp.ndarray:
    """The reference's hole mask: a warped pixel is valid iff its RGB sum is
    nonzero (blender_rot3d.py:402, llff_proj.py:563, dtu_proj.py:546)."""
    return jnp.sum(warped_rgb, axis=-1) != 0
