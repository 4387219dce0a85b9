"""Procedural miniature scenes written in each dataset's on-disk format.

Used by the test suite (the real NeRF-synthetic/LLFF/DTU data is not bundled)
and by demos/benchmarks.  Geometry: a colored disk/gradient object at known
depth so warp and ray math are verifiable.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np

from sinnerf_tpu.data import poses as pose_np
from sinnerf_tpu.data.depth_io import save_pfm


def _save_png(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


def _disk_image(h: int, w: int, rgba: bool) -> Tuple[np.ndarray, np.ndarray]:
    """A colored disk on transparent/white background + its depth map."""
    yy, xx = np.mgrid[0:h, 0:w]
    cx, cy, r = w / 2, h / 2, min(h, w) / 3
    dist = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
    inside = dist < r
    img = np.zeros((h, w, 4 if rgba else 3), np.float32)
    img[..., 0] = np.where(inside, 0.8, 1.0)
    img[..., 1] = np.where(inside, 0.3 + 0.4 * xx / w, 1.0)
    img[..., 2] = np.where(inside, 0.2 + 0.5 * yy / h, 1.0)
    if rgba:
        img[..., 3] = inside.astype(np.float32)
    # bulging depth: nearer at the disk center
    depth = np.where(inside, 4.0 - 0.5 * np.cos(dist / r * np.pi / 2), 0.0)
    return img, depth.astype(np.float32)


def _blender_pose(radius: float, theta_deg: float, phi_deg: float) -> np.ndarray:
    """OpenGL c2w looking at the origin from spherical coordinates."""
    th, ph = np.deg2rad(theta_deg), np.deg2rad(phi_deg)
    cam = pose_np.rot_theta(th) @ pose_np.rot_phi(ph) @ pose_np.trans_t(radius)
    return cam


def make_blender_scene(
    root: str, img_wh: Tuple[int, int] = (64, 64), n_frames: int = 3
) -> str:
    """NeRF-synthetic layout: transforms_train/mytest.json + pngs + depth_nerf."""
    h, w = img_wh[1], img_wh[0]
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth_nerf"), exist_ok=True)

    frames = []
    for i in range(n_frames):
        c2w = _blender_pose(4.0, 10.0 * i, -30.0)
        img, depth = _disk_image(h, w, rgba=True)
        name = f"train/r_{i}"
        _save_png(os.path.join(root, name + ".png"), img)
        np.save(
            os.path.join(root, "depth_nerf", f"r_{i}.npy"), depth
        )
        frames.append(
            {"file_path": f"./{name}", "transform_matrix": c2w.tolist()}
        )
    meta = {"camera_angle_x": 0.6911112070083618, "frames": frames}
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump(meta, f)
    # mytest split: 60 frames sliced [30-angle : 30+angle] by the loader
    mytest_frames = [
        {
            "file_path": frames[0]["file_path"],
            "transform_matrix": _blender_pose(4.0, 3.0 * (i - 30), -30.0).tolist(),
        }
        for i in range(60)
    ]
    with open(os.path.join(root, "transforms_mytest.json"), "w") as f:
        json.dump({"camera_angle_x": 0.6911112070083618, "frames": mytest_frames}, f)
    return root


def make_llff_scene(
    root: str, img_wh: Tuple[int, int] = (64, 48), n_images: int = 5
) -> str:
    """LLFF layout: poses_bounds.npy + images/*.JPG + depth_nerf/."""
    w, h = img_wh
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth_nerf"), exist_ok=True)

    focal = 1.2 * w
    rows = []
    rng = np.random.default_rng(0)
    for i in range(n_images):
        # forward-facing cameras, small lateral offsets; middle image closest
        # to center so val_idx lands in the interior (ref = val-1 >= 0)
        t = np.array(
            [0.4 * (i - n_images // 2), 0.05 * rng.standard_normal(), 10.0]
        )
        c2w_rub = np.concatenate([np.eye(3), t[:, None]], axis=1)  # right-up-back
        # store as "down right back" (inverse of the loader's axis fix)
        c2w_drb = np.concatenate(
            [-c2w_rub[:, 1:2], c2w_rub[:, 0:1], c2w_rub[:, 2:4]], axis=1
        )
        hwf = np.array([h, w, focal]).reshape(3, 1)
        rows.append(
            np.concatenate(
                [np.concatenate([c2w_drb, hwf], axis=1).reshape(-1), [8.0, 14.0]]
            )
        )
        img = np.zeros((h, w, 3), np.float32)
        img[..., 0] = np.linspace(0, 1, w)[None, :]
        img[..., 1] = np.linspace(0, 1, h)[:, None]
        img[..., 2] = 0.3 + 0.1 * i
        _save_png(os.path.join(root, "images", f"IMG_{i:04d}.JPG"), img)
        depth = 10.0 + 2.0 * np.linspace(0, 1, w)[None, :] * np.ones((h, 1))
        np.save(
            os.path.join(root, "depth_nerf", f"IMG_{i:04d}.npy"),
            depth.astype(np.float32),
        )
    np.save(os.path.join(root, "poses_bounds.npy"), np.stack(rows))
    return root


def make_dtu_scene(
    root: str,
    img_wh: Tuple[int, int] = (64, 64),
    scan: int = 4,
    n_src: int = 3,
) -> str:
    """DTU layout: Cameras/{train/*_cam.txt,pair.txt} + Rectified pngs +
    MVSNet_pytorch_outputs pfms (1/4-res, the loader upsamples 4x)."""
    w, h = img_wh
    cam_dir = os.path.join(root, "Cameras", "train")
    rect_dir = os.path.join(root, f"Rectified/scan{scan}_train")
    mvs_dir = os.path.join(root, f"MVSNet_pytorch_outputs/scan{scan}/depth_est")
    for d in (cam_dir, rect_dir, mvs_dir):
        os.makedirs(d, exist_ok=True)

    f4 = 0.3 * w  # cam files hold 1/4-res intrinsics; loader multiplies by 4
    view_ids = [2] + [10 + i for i in range(n_src)]
    for j, vid in enumerate(view_ids):
        # cameras on a small arc looking at the origin from +z
        angle = 0.06 * j
        rot = pose_np.rot_theta(angle)[:3, :3]
        center = rot @ np.array([0.0, 0.0, -600.0])
        z = -center / np.linalg.norm(center)
        up = np.array([0.0, -1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([x, y, z], axis=1)
        c2w[:3, 3] = center
        w2c = np.linalg.inv(c2w)
        lines = ["extrinsic"]
        for r in range(4):
            lines.append(" ".join(f"{v:.8f}" for v in w2c[r]))
        lines += [
            "",
            "intrinsic",
            f"{f4:.4f} 0 {w / 8:.4f}",
            f"0 {f4:.4f} {h / 8:.4f}",
            "0 0 1",
            "",
            "425.0 2.5",
        ]
        with open(os.path.join(cam_dir, f"{vid:08d}_cam.txt"), "w") as f:
            f.write("\n".join(lines))

        img = np.zeros((h, w, 3), np.float32)
        img[..., 0] = 0.2 + 0.6 * np.linspace(0, 1, w)[None, :]
        img[..., 1] = 0.2 + 0.6 * np.linspace(0, 1, h)[:, None]
        img[..., 2] = 0.5
        _save_png(os.path.join(rect_dir, f"rect_{vid + 1:03d}_3_r5000.png"), img)
        depth4 = np.full((h // 4, w // 4), 600.0, np.float32)
        save_pfm(
            os.path.join(mvs_dir, f"rect_{vid + 1:03d}_3_r5000.pfm"), depth4
        )

    pair_lines = [str(len(view_ids))]
    for vid in view_ids:
        pair_lines.append(str(vid))
        others = [v for v in view_ids if v != vid]
        pair_lines.append(
            f"{len(others)} " + " ".join(f"{v} 100.0" for v in others)
        )
    with open(os.path.join(root, "Cameras", "pair.txt"), "w") as f:
        f.write("\n".join(pair_lines))
    return root
