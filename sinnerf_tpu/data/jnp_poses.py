"""Pose math as traced jnp functions, for use *inside* jitted samplers.

The blender rot3d pipeline warps a freshly-rotated pseudo-view **per training
step** with host-side numpy + a Python warp
(``blender_ray_patch_1image_rot3d.py:468-499``); here the rotation and the
OpenGL->OpenCV w2c conversion run on device, keyed by the step PRNG.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# Plain numpy on purpose: a module-level jnp.array would initialize the JAX
# backend at import time (breaking hosts where the platform must be chosen
# first, e.g. the driver's CPU-forced dryrun); jnp converts it when traced.
_GL_TO_CV = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]], dtype=np.float32)


def _rot_x(phi):
    c, s = jnp.cos(phi), jnp.sin(phi)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z]),
            jnp.stack([z, c, -s]),
            jnp.stack([z, s, c]),
        ]
    )


def _rot_y(th):
    c, s = jnp.cos(th), jnp.sin(th)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, -s]),
            jnp.stack([z, o, z]),
            jnp.stack([s, z, c]),
        ]
    )


def _rot_z(th):
    c, s = jnp.cos(th), jnp.sin(th)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z]),
            jnp.stack([s, c, z]),
            jnp.stack([z, z, o]),
        ]
    )


def rotate_3d(c2w: jnp.ndarray, x_deg, y_deg, z_deg) -> jnp.ndarray:
    """Traced equivalent of poses.rotate_3d: world-frame Euler rotation of a
    (3, 4) or (4, 4) pose; returns (3, 4)."""
    c2w = jnp.asarray(c2w)[:3, :4]
    rot = (
        _rot_x(jnp.deg2rad(x_deg))
        @ _rot_y(jnp.deg2rad(y_deg))
        @ _rot_z(jnp.deg2rad(z_deg))
    )
    return jnp.concatenate([rot @ c2w[:, :3], rot @ c2w[:, 3:]], axis=1)


def c2w_to_w2c_cv(c2w: jnp.ndarray) -> jnp.ndarray:
    """Traced equivalent of poses.convert_c2w_to_w2c_cv; (.., 3, 4) -> (4, 4)."""
    r, t = c2w[:3, :3], c2w[:3, 3:]
    r_w2c = r.T
    t_w2c = -r_w2c @ t
    top = jnp.concatenate([_GL_TO_CV @ r_w2c, _GL_TO_CV @ t_w2c], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    return jnp.concatenate([top, bottom], axis=0)


def projection_matrix(k3: jnp.ndarray, w2c4: jnp.ndarray) -> jnp.ndarray:
    """P[:3] = K @ w2c[:3]; (4, 4) output."""
    top = k3 @ w2c4[:3, :4]
    return jnp.concatenate([top, w2c4[3:4, :]], axis=0)
