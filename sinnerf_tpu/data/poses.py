"""Camera pose math (host-side numpy — tiny matrices, run once per scene).

Parity targets:
* rotation helpers / ``rotate_3d`` / ``convert`` / ``flatten`` —
  ``datasets/blender_ray_patch_1image_rot3d.py:31-100``
* ``average_poses`` / ``center_poses`` — ``datasets/llff_ray_patch_1image_proj.py:174-241``
* spiral/spheric test paths — ``datasets/llff_ray_patch_1image_proj.py:244-319``
* DTU ``look_at_rotation`` / ``pose_spherical_dtu`` — ``datasets/dtu_proj.py:45-72,130-164``

Conventions: blender/LLFF c2w are OpenGL-style (x right, y up, -z forward);
``convert`` produces an OpenCV-style (y down, +z forward) world-to-camera
matrix used by the warping projections.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# OpenGL camera -> OpenCV camera axis flip.
_GL_TO_CV = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], dtype=np.float64)


def trans_t(t: float) -> np.ndarray:
    m = np.eye(4)
    m[2, 3] = t
    return m


def rot_phi(phi: float) -> np.ndarray:
    c, s = np.cos(phi), np.sin(phi)
    return np.array(
        [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], dtype=np.float64
    )


def rot_theta(th: float) -> np.ndarray:
    c, s = np.cos(th), np.sin(th)
    return np.array(
        [[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]], dtype=np.float64
    )


def rot_z(th: float) -> np.ndarray:
    c, s = np.cos(th), np.sin(th)
    return np.array(
        [[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=np.float64
    )


def rotate_3d(c2w: np.ndarray, x_deg: float, y_deg: float, z_deg: float) -> np.ndarray:
    """World-frame rotation of a camera pose by Euler angles in degrees
    (blender_rot3d.py:80-82): ``rot_phi(x) @ rot_theta(y) @ rot_z(z) @ c2w``."""
    c2w4 = to_homo(c2w)
    rot = (
        rot_phi(np.deg2rad(x_deg))
        @ rot_theta(np.deg2rad(y_deg))
        @ rot_z(np.deg2rad(z_deg))
    )
    return rot @ c2w4


def to_homo(pose: np.ndarray) -> np.ndarray:
    """(3, 4) -> (4, 4) with [0, 0, 0, 1] appended."""
    pose = np.asarray(pose, dtype=np.float64)
    if pose.shape[0] == 4:
        return pose
    return np.concatenate([pose, np.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)


def invert_pose(pose: np.ndarray) -> np.ndarray:
    """``flatten`` in the reference (blender_rot3d.py:74-77): homogeneous
    inverse, returned as (3, 4)."""
    return np.linalg.inv(to_homo(pose))[:3, :4]


def convert_c2w_to_w2c_cv(c2w: np.ndarray) -> np.ndarray:
    """OpenGL c2w -> OpenCV w2c 4x4 (blender_rot3d.py:85-100).

    ``R' = flip @ R^T``, ``t' = flip @ (-R^T t)`` where flip negates the y/z
    camera axes.  The result left-composes with intrinsics K to form the
    projection matrix used for depth warping.
    """
    c2w = to_homo(c2w)
    r, t = c2w[:3, :3], c2w[:3, 3:]
    r_w2c = r.T
    t_w2c = -r_w2c @ t
    out = np.eye(4)
    out[:3, :3] = _GL_TO_CV @ r_w2c
    out[:3, 3:] = _GL_TO_CV @ t_w2c
    return out


def projection_matrix(k: np.ndarray, w2c: np.ndarray) -> np.ndarray:
    """4x4 pixel-projection matrix P with P[:3] = K @ w2c[:3] (dtu_proj.py:351-352)."""
    p = to_homo(np.asarray(w2c, dtype=np.float64)).copy()
    p[:3, :4] = np.asarray(k, dtype=np.float64) @ p[:3, :4]
    return p


def normalize(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


def average_poses(poses: np.ndarray) -> np.ndarray:
    """(N, 3, 4) -> (3, 4) average pose (llff_proj.py:174-210)."""
    center = poses[..., 3].mean(0)
    z = normalize(poses[..., 2].mean(0))
    y_ = poses[..., 1].mean(0)
    x = normalize(np.cross(y_, z))
    y = np.cross(z, x)
    return np.stack([x, y, z, center], 1)


def center_poses(poses: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Recenter poses about their average (llff_proj.py:213-241).
    Returns (poses_centered (N, 3, 4), inverse-average (4, 4))."""
    pose_avg_homo = np.eye(4)
    pose_avg_homo[:3] = average_poses(poses)
    last_row = np.tile(np.array([0, 0, 0, 1.0]), (len(poses), 1, 1))
    poses_homo = np.concatenate([poses, last_row], 1)
    inv_avg = np.linalg.inv(pose_avg_homo)
    return (inv_avg @ poses_homo)[:, :3], inv_avg


def create_spiral_poses(
    radii: np.ndarray, focus_depth: float, n_poses: int = 120
) -> np.ndarray:
    """LLFF spiral render path (llff_proj.py:244-276)."""
    poses = []
    for t in np.linspace(0, 4 * np.pi, n_poses + 1)[:-1]:
        center = np.array([np.cos(t), -np.sin(t), -np.sin(0.5 * t)]) * radii
        z = normalize(center - np.array([0, 0, -focus_depth]))
        y_ = np.array([0.0, 1.0, 0.0])
        x = normalize(np.cross(y_, z))
        y = np.cross(z, x)
        poses.append(np.stack([x, y, z, center], 1))
    return np.stack(poses, 0)


def create_spheric_poses(radius: float, n_poses: int = 120) -> np.ndarray:
    """Circular render path around z (llff_proj.py:279-319)."""

    def spheric_pose(theta: float, phi: float, radius: float) -> np.ndarray:
        t = np.eye(4)
        t[1, 3] = -0.9 * radius
        t[2, 3] = radius
        c2w = rot_theta(theta) @ rot_phi(phi) @ t
        flip = np.array(
            [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1.0]]
        )
        return (flip @ c2w)[:3]

    return np.stack(
        [
            spheric_pose(th, -np.pi / 5, radius)
            for th in np.linspace(0, 2 * np.pi, n_poses + 1)[:-1]
        ],
        0,
    )


def look_at_rotation(
    camera_position: np.ndarray,
    at=(0.0, 0.0, 0.0),
    up=(0.0, 0.0, 1.0),
) -> np.ndarray:
    """Batched look-at rotation (dtu_proj.py:45-72).  camera_position: (N, 3)."""
    pos = np.atleast_2d(np.asarray(camera_position, dtype=np.float64))
    at = np.broadcast_to(np.asarray(at, dtype=np.float64), pos.shape)
    up = np.broadcast_to(np.asarray(up, dtype=np.float64), pos.shape)

    def norm_rows(v):
        return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-5)

    z_axis = norm_rows(pos - at)
    x_axis = norm_rows(np.cross(up, z_axis))
    y_axis = norm_rows(np.cross(z_axis, x_axis))
    degenerate = np.all(np.isclose(x_axis, 0.0, atol=5e-3), axis=1, keepdims=True)
    if degenerate.any():
        replacement = norm_rows(np.cross(y_axis, z_axis))
        x_axis = np.where(degenerate, replacement, x_axis)
    r = np.stack([x_axis, y_axis, z_axis], axis=1)
    return np.swapaxes(r, 1, 2)


def pose_spherical_dtu(
    radii: np.ndarray,
    focus_depth: float,
    n_poses: int = 120,
    world_center: np.ndarray = np.zeros(3),
) -> np.ndarray:
    """DTU spiral render path (dtu_proj.py:130-164); OpenCV-handed output."""
    poses = []
    for t in np.linspace(0, 4 * np.pi, n_poses + 1)[:-1]:
        center = np.array([np.cos(t), -np.sin(t), -np.sin(0.5 * t)]) * radii
        z = normalize(center - np.array([0, 0, -focus_depth]))
        y_ = np.array([0.0, 1.0, 0.0])
        x = normalize(np.cross(y_, z))
        y = np.cross(z, x)
        poses.append(np.stack([x, y, z, center + world_center], 1))
    flip = np.array([[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1.0]])
    return np.stack(poses, 0) @ flip


def rot3d_grid(ref_c2w: np.ndarray, angle: int) -> np.ndarray:
    """The 125-pose pseudo-view bank: x, y, z in {-a, -a/2, 0, a/2, a}
    (blender_rot3d.py:365-370).  Returns (125, 3, 4)."""
    out = []
    step = max(angle // 2, 1)
    for x in range(-angle, angle + 1, step):
        for y in range(-angle, angle + 1, step):
            for z in range(-angle, angle + 1, step):
                out.append(rotate_3d(ref_c2w, x, y, z)[:3, :4])
    return np.stack(out, 0)


def rot_z_linspace(ref_c2w: np.ndarray, angle: float, n: int = 60) -> np.ndarray:
    """Single-axis pseudo-view bank for blender `proj`
    (blender_ray_patch_1image_proj.py:355-356): rot_z over
    linspace(-angle, angle, n)."""
    ref4 = to_homo(ref_c2w)
    return np.stack(
        [
            (rot_z(np.deg2rad(a)) @ ref4)[:3, :4]
            for a in np.linspace(-angle, angle, n)
        ],
        0,
    )
