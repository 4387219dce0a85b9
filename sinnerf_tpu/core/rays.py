"""Ray generation from camera intrinsics/extrinsics.

Reference semantics: ``datasets/ray_utils.py`` (pinhole, -z forward, rays NOT
normalized — the renderer scales deltas by ``||d||`` instead) and the DTU +z
convention at ``datasets/dtu_proj.py:17-35``.

TPU-first note: ray generation is a pure function of ``(H, W, focal, c2w)`` and
jit-compiles on device; datasets never precompute giant host-side ray buffers
the way the reference does (``blender_rot3d.py:253-331``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def pixel_grid(
    h: int, w: int, n_h: int = -1, n_w: int = -1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(i, j) pixel-center coordinates, optionally sparsely strided.

    Matches ``ray_utils.create_meshgrid(normalized_coordinates=False)``
    (``ray_utils.py:5-70``): returns x (i) and y (j) grids of shape (H, W) —
    or (n_h, n_w) when sparse sampling is requested.
    """
    if n_h != -1 and n_w != -1:
        ys = jnp.linspace(0.0, h - 1.0, n_h)
        xs = jnp.linspace(0.0, w - 1.0, n_w)
    else:
        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)
    jj, ii = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)
    return ii, jj


def get_ray_directions(
    h: int, w: int, focal: float, n_h: int = -1, n_w: int = -1
) -> jnp.ndarray:
    """Per-pixel ray directions in camera frame, OpenGL convention
    (x right, y up, camera looks along -z).  Matches ``ray_utils.py:73-93``
    including the absence of the +0.5 pixel-center offset.
    """
    ii, jj = pixel_grid(h, w, n_h, n_w)
    return jnp.stack(
        [(ii - w / 2) / focal, -(jj - h / 2) / focal, -jnp.ones_like(ii)],
        axis=-1,
    )  # (H, W, 3)


def get_ray_directions_pz(h: int, w: int, focal: jnp.ndarray) -> jnp.ndarray:
    """DTU/MVS convention: x right, y down, camera looks along +z.
    Matches ``datasets/dtu_proj.py:17-35`` (``get_ray_directions_dtu``):
    directions built from the intrinsics' principal point.

    ``focal`` here is a full 3x3 intrinsics matrix K.
    """
    k = jnp.asarray(focal)
    ii, jj = pixel_grid(h, w)
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]
    return jnp.stack(
        [(ii - cx) / fx, (jj - cy) / fy, jnp.ones_like(ii)], axis=-1
    )


def get_rays(
    directions: jnp.ndarray, c2w: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World-frame ray origins/directions for one camera.

    directions: (..., 3) camera-frame; c2w: (3, 4).  Returns flattened
    (N, 3), (N, 3).  Directions are deliberately NOT normalized
    (``ray_utils.py:96-120``) — compositing scales by ``||d||``.
    """
    rays_d = directions @ c2w[:, :3].T
    rays_o = jnp.broadcast_to(c2w[:, 3], rays_d.shape)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)


def make_ray_bundle(
    directions: jnp.ndarray,
    c2w: jnp.ndarray,
    near: float,
    far: float,
) -> jnp.ndarray:
    """Pack rays as the 8-float layout ``[o(3), d(3), near, far]`` used by the
    whole framework (``blender_rot3d.py:310-313``)."""
    rays_o, rays_d = get_rays(directions, c2w)
    near_col = jnp.full_like(rays_o[:, :1], near)
    far_col = jnp.full_like(rays_o[:, :1], far)
    return jnp.concatenate([rays_o, rays_d, near_col, far_col], axis=-1)


def get_ndc_rays(
    h: int,
    w: int,
    focal: float,
    near: float,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shift rays to the near plane and project into NDC.

    Matches ``ray_utils.py:123-164``.  Present for parity with the classic
    LLFF pipeline; the SinNeRF recipes all run with ``ndc=False``
    (``llff_ray_patch_1image_proj.py:347``).
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]

    o0 = -1.0 / (w / (2.0 * focal)) * ox_oz
    o1 = -1.0 / (h / (2.0 * focal)) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (w / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (h / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2

    return jnp.stack([o0, o1, o2], axis=-1), jnp.stack([d0, d1, d2], axis=-1)
