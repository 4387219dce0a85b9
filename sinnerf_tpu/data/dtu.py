"""DTU MVS single-image dataset.

Parity target: ``MVSDatasetDTU_proj`` — ``datasets/dtu_proj.py:276-662``.
Reference view id=2 under light 3, depth from MVSNet PFM upsampled 4x,
world scale 1/200, pseudo views from ``Cameras/pair.txt`` src list, z-buffered
numpy painter warp with full K@E projection matrices.

Deviation: the reference dumps debug images into ``vis/`` at load time
(``dtu_proj.py:524-528``) — we don't.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import cv2
import numpy as np

from sinnerf_tpu.core.rays import get_ray_directions_pz
from sinnerf_tpu.data.base import (
    SingleImageDataset,
    build_proj_index,
    build_warp_banks,
    load_image,
    pack_rays_np,
)
from sinnerf_tpu.data.depth_io import read_pfm
from sinnerf_tpu.data.sampler import SamplerConfig, compute_real_origins

SCALE_FACTOR = 1.0 / 200  # dtu_proj.py:290
LIGHT_IDX = 3  # dtu_proj.py:299
REF_VIEW_ID = 2  # dtu_proj.py:300


def read_cam_file(filename: str, scale_factor: float = SCALE_FACTOR):
    """Parse a DTU cam file -> (intrinsics (3,3), extrinsics (4,4) w2c,
    (near, far)).  dtu_proj.py:384-400; near/far = depth_min + 192*interval,
    both world-scaled."""
    with open(filename) as f:
        lines = [line.rstrip() for line in f.readlines()]
    extrinsics = np.fromstring(" ".join(lines[1:5]), dtype=np.float32, sep=" ")
    extrinsics = extrinsics.reshape(4, 4)
    intrinsics = np.fromstring(" ".join(lines[7:10]), dtype=np.float32, sep=" ")
    intrinsics = intrinsics.reshape(3, 3)
    depth_min = float(lines[11].split()[0]) * scale_factor
    depth_max = depth_min + float(lines[11].split()[1]) * 192 * scale_factor
    return intrinsics, extrinsics, (depth_min, depth_max)


def read_pair_file(filename: str, ref_id: int) -> List[int]:
    """src-view list for ``ref_id`` from pair.txt (dtu_proj.py:318-333)."""
    with open(filename) as f:
        num_viewpoint = int(f.readline())
        for _ in range(num_viewpoint):
            ref_view = int(f.readline().rstrip())
            src_views = [int(x) for x in f.readline().rstrip().split()[1::2]]
            if ref_view == ref_id:
                return src_views
    raise ValueError(f"view {ref_id} not found in {filename}")


class DTUProj(SingleImageDataset):
    dataset_name = "dtu_proj"

    def __init__(
        self,
        root_dir: str,
        split: str = "train",
        img_wh: Tuple[int, int] = (640, 512),
        scan: int = 4,
        patch_size_x: int = 56,
        patch_size_y: int = 70,
        sW: int = 1,
        sH: int = 1,
        num_rays: int = 4096,
        ref_view_id: int = REF_VIEW_ID,
        light_idx: int = LIGHT_IDX,
        **kwargs,
    ):
        self.root_dir = root_dir
        self.split = split
        self.img_wh = img_wh
        self.scan = scan
        self.white_back = True  # dtu_proj.py:312
        w, h = img_wh

        def img_path(vid):
            return os.path.join(
                root_dir,
                f"Rectified/scan{scan}_train/rect_{vid + 1:03d}_{light_idx}_r5000.png",
            )

        # --- cameras -------------------------------------------------------
        # The x4 cam-file calibration is native at the on-disk rectified
        # image resolution (640x512 for distributed DTU); anchor the rescale
        # there so K tracks the --img_wh resize (a PIL header read, no decode)
        from PIL import Image

        self._cam_native_wh = Image.open(img_path(ref_view_id)).size

        ref_cam = os.path.join(root_dir, f"Cameras/train/{ref_view_id:08d}_cam.txt")
        intrinsic, extrinsic, (self.near, self.far) = self._load_cam(ref_cam)
        self.k3 = intrinsic
        self.ref_w2c = extrinsic
        self.ref_c2w = np.linalg.inv(extrinsic)

        self.src_views = read_pair_file(
            os.path.join(root_dir, "Cameras/pair.txt"), ref_view_id
        )
        self.focal = [intrinsic[0, 0], intrinsic[1, 1]]
        center = [intrinsic[0, 2], intrinsic[1, 2]]
        self.directions = np.asarray(get_ray_directions_pz(h, w, intrinsic))

        def depth_path(vid):
            return os.path.join(
                root_dir,
                "MVSNet_pytorch_outputs/",
                f"scan{scan}/depth_est/rect_{vid + 1:03d}_{light_idx}_r5000.pfm",
            )

        self._img_path, self._depth_path = img_path, depth_path

        if split == "train":
            self._build_train(
                ref_view_id, patch_size_x, patch_size_y, sW, sH, num_rays
            )
        else:
            # val/test render the ref pose then every src pose (dtu_proj.py:511,533)
            self.val_rays, self.val_rgbs = [], []
            for vid, c2w in self._val_poses(ref_view_id):
                self.val_rays.append(
                    pack_rays_np(self.directions, c2w[:3, :4], self.near, self.far)
                )
                self.val_rgbs.append(
                    load_image(img_path(vid), img_wh, resample="bilinear").reshape(-1, 3)
                )
            self.length = len(self.val_rays)

    def _load_cam(self, path):
        """Read + post-process one MVS cam file: x4 to full resolution (the
        files store 1/4-res intrinsics, dtu_proj.py:346), rescale the
        calibration from the on-disk rectified image resolution (640x512 for
        distributed DTU) to ``img_wh``, and apply the 1/200 world scale to
        the translation.  Deviation: the reference keeps the native-res
        intrinsics at ANY ``img_wh`` (dtu_proj.py:485 builds directions from
        the unscaled focal/center), silently skewing all geometry at
        non-native sizes; here K tracks the image resize — a no-op at the
        published 640x512 recipe."""
        intrinsic, extrinsic, bounds = read_cam_file(path)
        intrinsic = intrinsic.copy()
        intrinsic[:2] *= 4
        w, h = self.img_wh
        intrinsic[0] *= w / self._cam_native_wh[0]
        intrinsic[1] *= h / self._cam_native_wh[1]
        extrinsic = extrinsic.copy()
        extrinsic[:3, 3] *= SCALE_FACTOR
        return intrinsic, extrinsic, bounds

    def _val_poses(self, ref_view_id):
        out = [(ref_view_id, self.ref_c2w)]
        for vid in self.src_views:
            cam = os.path.join(self.root_dir, f"Cameras/train/{vid:08d}_cam.txt")
            _, ext, _ = self._load_cam(cam)
            out.append((vid, np.linalg.inv(ext)))
        return out

    def _read_depth(self, vid: int) -> np.ndarray:
        depth, _ = read_pfm(self._depth_path(vid))
        depth = cv2.resize(
            depth.astype(np.float32), None, fx=4, fy=4, interpolation=cv2.INTER_LINEAR
        )
        return depth * SCALE_FACTOR

    def _build_train(self, ref_view_id, psx, psy, sW, sH, num_rays):
        w, h = self.img_wh
        ref_image = load_image(self._img_path(ref_view_id), self.img_wh, resample="bilinear")
        ref_depth = self._read_depth(ref_view_id)
        if ref_depth.shape != (h, w):
            ref_depth = cv2.resize(ref_depth, (w, h), interpolation=cv2.INTER_LINEAR)

        rays = pack_rays_np(self.directions, self.ref_c2w[:3, :4], self.near, self.far)
        rgbs = ref_image.reshape(-1, 3)
        depth = ref_depth.reshape(-1, 1)

        # src poses + full K@E projection mats (dtu_proj.py:351-352)
        ref_proj = np.eye(4)
        ref_proj[:3, :4] = self.k3 @ self.ref_w2c[:3, :4]
        bank_c2w, src_projs = [], []
        for vid in self.src_views:
            cam = os.path.join(self.root_dir, f"Cameras/train/{vid:08d}_cam.txt")
            intr, ext, _ = self._load_cam(cam)
            p = np.eye(4)
            p[:3, :4] = intr @ ext[:3, :4]
            src_projs.append(p)
            bank_c2w.append(np.linalg.inv(ext)[:3, :4])
        bank_c2w = np.stack(bank_c2w).astype(np.float32)
        src_projs = np.stack(src_projs)

        bank_rgb, bank_depth = build_warp_banks(
            ref_image, ref_depth, ref_proj, src_projs, zbuffer=True
        )
        proj_pose, proj_pix, proj_depth = build_proj_index(bank_rgb, bank_depth)

        scene = {
            "ref_image": ref_image,
            "ref_depth": ref_depth.astype(np.float32),
            "directions": self.directions.astype(np.float32),
            # (N, 12) [o,d,near,far,rgb,depth]; banks channel-major (P,3,H,W)
            # — see the sampler docstring's HBM layout note
            "pool": np.concatenate([rays, rgbs, depth], -1).astype(np.float32),
            "proj_pose": proj_pose,
            "proj_pix": proj_pix,
            "proj_depth": proj_depth,
            "bank_c2w": bank_c2w,
            "bank_rgb": np.ascontiguousarray(
                bank_rgb.astype(np.float32).transpose(0, 3, 1, 2)
            ),
            "bank_depth": bank_depth.astype(np.float32),
            "k3": self.k3.astype(np.float32),
            "ref_c2w": self.ref_c2w[:3, :4].astype(np.float32),
            "near_far": np.array([self.near, self.far], np.float32),
        }
        self.cfg = SamplerConfig(
            height=h,
            width=w,
            psx=psx,
            psy=psy,
            s_row=sW,
            s_col=sH,
            num_rays=num_rays,
            reject_real_patch="mean_gt_001",
        )
        origins = compute_real_origins(ref_image, self.cfg)
        if origins is not None:
            scene["real_origins"] = origins
        self.scene = self._finalize_scene(scene)
        self.length = len(bank_c2w)
        self.val_rays, self.val_rgbs = [], []
