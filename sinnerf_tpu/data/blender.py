"""NeRF-synthetic (blender) single-image datasets.

Parity targets:
* ``Blender_ray_patch_1image_rot3d_Dataset`` —
  ``datasets/blender_ray_patch_1image_rot3d.py:153-571``
* ``Blender_ray_patch_1image_proj_Dataset`` —
  ``datasets/blender_ray_patch_1image_proj.py`` (same machinery, pseudo views
  are 60 single-axis rot_z interpolations instead of the 125-pose 3D grid)

Differences from the reference (intentional, documented):
* Only the reference frame is loaded from disk (the reference iterates every
  frame and discards all but one, ``blender_rot3d.py:262-326``).
* The principal point is ``((W-1)/2, (H-1)/2)`` — the reference hardcodes
  ``(400-1)/2`` (``blender_rot3d.py:206-207``), identical for its 400x400
  recipes, wrong for any other size.
* The per-item fresh pseudo-view warp runs on device inside the jitted
  sampler (SamplerConfig.fresh_warp) instead of host numpy per DataLoader
  worker.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from sinnerf_tpu.core.rays import get_ray_directions
from sinnerf_tpu.data import poses as pose_np
from sinnerf_tpu.data.base import (
    SingleImageDataset,
    build_proj_index,
    build_warp_banks,
    load_image,
    pack_rays_np,
)
from sinnerf_tpu.data.sampler import SamplerConfig, compute_real_origins

# Scene-keyed reference frame table (blender_rot3d.py:223-239).
REF_IDX = {
    "lego": 20,
    "chair": 99,
    "ship": 80,
    "hotdog": 3,
    "mic": 15,
    "ficus": 22,
    "drums": 19,
}

NEAR, FAR = 2.0, 6.0  # blender_rot3d.py:210-211


def _scene_ref_idx(root_dir: str) -> Optional[int]:
    for name, idx in REF_IDX.items():
        if name in root_dir:
            return idx
    return None


class BlenderRot3D(SingleImageDataset):
    """Single-image blender dataset with a 3D-rotated pseudo-view grid."""

    dataset_name = "blender_ray_patch_1image_rot3d"
    pseudo_mode = "rot3d"

    def __init__(
        self,
        root_dir: str,
        split: str = "train",
        img_wh: Tuple[int, int] = (400, 400),
        patch_size: int = 64,
        sW: int = 1,
        sH: int = 1,
        angle: int = 20,
        load_depth: bool = True,
        depth_type: str = "nerf",
        with_ref: bool = True,
        ref_idx: Optional[int] = None,
        num_rays: int = 4096,
        **kwargs,
    ):
        assert img_wh[0] == img_wh[1], "image width must equal image height!"
        self.root_dir = root_dir
        self.split = split
        self.img_wh = img_wh
        self.angle = angle
        self.white_back = True
        w, h = img_wh

        # 'lego'/'hotdog' ship a transforms_mytest.json eval split
        # (blender_rot3d.py:169-172).
        self.my_test = ("lego" in root_dir) or ("hotdog" in root_dir)

        meta = self._load_meta("train")
        focal = 0.5 * 800 / np.tan(0.5 * meta["camera_angle_x"])
        focal *= w / 800
        self.focal = focal
        self.k3 = np.array(
            [[focal, 0, (w - 1) / 2], [0, focal, (h - 1) / 2], [0, 0, 1.0]],
            dtype=np.float32,
        )
        self.directions = np.asarray(get_ray_directions(h, w, focal))

        ridx = ref_idx if ref_idx is not None else _scene_ref_idx(root_dir)
        if ridx is None:
            raise NotImplementedError(f"unknown blender scene: {root_dir}")
        if depth_type == "gt":
            # the reference re-reads transforms_mytest.json and pins the
            # reference frame to mytest index 29 (blender/r_58) for the scenes
            # that ship a my_testset (blender_rot3d.py:242-252); an explicit
            # --ref_idx keeps unknown (e.g. synthetic) scenes usable
            meta = self._load_meta("mytest")
            if ref_idx is None:
                if not self.my_test:
                    raise NotImplementedError(
                        "depth_type='gt' needs a my_testset scene "
                        "(lego/hotdog) or an explicit --ref_idx"
                    )
                ridx = 29
        self.ref_idx = ridx

        if split == "train":
            self._build_train(meta, depth_type, patch_size, sW, sH, num_rays)
        else:
            self._build_val(meta)

    # ------------------------------------------------------------------ train
    def _build_train(self, meta, depth_type, patch_size, sW, sH, num_rays):
        w, h = self.img_wh
        frame = meta["frames"][self.ref_idx]
        ref_c2w = np.array(frame["transform_matrix"], dtype=np.float64)
        self.ref_c2w = ref_c2w

        img_path = os.path.join(self.root_dir, frame["file_path"] + ".png")
        ref_image = load_image(img_path, self.img_wh, blend_alpha_to_white=True)
        ref_depth = self._load_depth(img_path, depth_type)

        rays = pack_rays_np(self.directions, ref_c2w[:3, :4], NEAR, FAR)
        rgbs = ref_image.reshape(-1, 3)
        depth = ref_depth.reshape(-1, 1)
        nonzero = rgbs.sum(-1) != 3  # non-white pixels (blender_rot3d.py:330)
        # one (N, 12) [o,d,near,far,rgb,depth] pool per draw source — three
        # separate (N,<12) arrays would each pad to (N,128) in HBM
        packed = np.concatenate([rays, rgbs, depth], axis=-1).astype(np.float32)

        bank_c2w = self._pseudo_bank(ref_c2w)
        ref_proj = pose_np.projection_matrix(
            self.k3, pose_np.convert_c2w_to_w2c_cv(ref_c2w)
        )
        src_projs = np.stack(
            [
                pose_np.projection_matrix(
                    self.k3, pose_np.convert_c2w_to_w2c_cv(c)
                )
                for c in bank_c2w
            ]
        )
        bank_rgb, bank_depth = build_warp_banks(
            ref_image, ref_depth, ref_proj, src_projs,
            zbuffer=False,  # blender warp is last-write (blender_rot3d.py:148-149)
        )
        proj_pose, proj_pix, proj_depth = build_proj_index(bank_rgb, bank_depth)

        scene = {
            "ref_image": ref_image,
            "ref_depth": ref_depth,
            "directions": self.directions.astype(np.float32),
            "pool": packed[nonzero],
            "any": packed,
            "proj_pose": proj_pose,
            "proj_pix": proj_pix,
            "proj_depth": proj_depth,
            "bank_c2w": bank_c2w.astype(np.float32),
            "k3": self.k3,
            "ref_c2w": ref_c2w[:3, :4].astype(np.float32),
            "near_far": np.array([NEAR, FAR], np.float32),
        }
        if self.pseudo_mode != "rot3d":
            # proj-style sampling reads precomputed warp banks; rot3d warps a
            # fresh gaussian pseudo-view on device per item instead.  Banks
            # are stored channel-major (P,3,H,W): a resident (P,H,W,3) pads
            # 3 -> 128 lanes in HBM (42x its logical size)
            scene["bank_rgb"] = np.ascontiguousarray(
                np.asarray(bank_rgb, np.float32).transpose(0, 3, 1, 2)
            )
            scene["bank_depth"] = np.asarray(bank_depth, np.float32)
        self.cfg = self._sampler_cfg(h, w, patch_size, sW, sH, num_rays)
        origins = compute_real_origins(ref_image, self.cfg)
        if origins is not None:
            scene["real_origins"] = origins
        self.scene = self._finalize_scene(scene)
        self.length = max(len(bank_c2w), 1)
        self.val_rays, self.val_rgbs = [], []

    def _pseudo_bank(self, ref_c2w) -> np.ndarray:
        """(P, 3, 4) pseudo-view pose bank (blender_rot3d.py:365-370)."""
        return pose_np.rot3d_grid(ref_c2w, self.angle)  # (125, 3, 4)

    def _sampler_cfg(self, h, w, patch_size, sW, sH, num_rays) -> SamplerConfig:
        """rot3d batch composition (blender_rot3d.py:443-502): num random rays
        split num//10 any-pixel + rest nonzero, real patch rejected on
        ``max != 0``, warp patch rejected on zero depth sum."""
        return SamplerConfig(
            height=h,
            width=w,
            psx=patch_size,
            psy=patch_size,
            s_row=sW,
            s_col=sH,
            num_rays=num_rays,
            n_any=num_rays // 10,
            fresh_warp=True,
            angle=self.angle,
            reject_real_patch="max_nonzero",
            reject_warp_patch=True,
        )

    # -------------------------------------------------------------------- val
    def _build_val(self, train_meta):
        if self.split == "test_train2":
            # 30 rot-z poses around the reference pose (blender_rot3d.py:
            # 414-420; consumed via poses_test at :537-538).  The reference's
            # __getitem__ crashes on the unbound `frame` for this split, so
            # the GT image is intent reconstruction: the ref frame's image
            # (what the val branch would bind at :532-534).  No fname —
            # 'test_train2'.endswith('train') is False (:568-569).
            frame = train_meta["frames"][self.ref_idx]
            ref_c2w = np.array(frame["transform_matrix"], dtype=np.float64)
            img = load_image(
                os.path.join(self.root_dir, frame["file_path"] + ".png"),
                self.img_wh,
                blend_alpha_to_white=True,
            )
            self.val_rays, self.val_rgbs = [], []
            for c2w in pose_np.rot_z_linspace(ref_c2w, self.angle, n=30):
                self.val_rays.append(
                    pack_rays_np(self.directions, c2w, NEAR, FAR)
                )
                self.val_rgbs.append(img.reshape(-1, 3))
            self.length = 30
            return
        if self.split == "test_train":
            # render every source frame of transforms_train.json
            # (blender_rot3d.py:180-181: test_train reads the train json) and
            # name outputs after the frames (':568-569: fname emitted when the
            # split endswith 'train') so files compare 1:1 with the reference.
            # Reload the train json explicitly: with depth_type='gt' the
            # `train_meta` argument was rebound to transforms_mytest.json in
            # __init__.  Intent reconstruction (README deviations): the
            # reference's gt block (blender_rot3d.py:242-252) rebinds
            # self.meta to the mytest json for EVERY split, but its
            # test_train getitem is unreachable either way (unbound `frame`
            # crash), and "test_train" means "render the train frames" —
            # so the gt rebind is treated as train-split-only here.
            frames = self._load_meta("train")["frames"]
            self.val_fnames = [f["file_path"] for f in frames]
        elif self.my_test:
            meta = self._load_meta("mytest")
            frames = meta["frames"][30 - self.angle : 30 + self.angle]
        else:
            frames = [train_meta["frames"][self.ref_idx]]
        self.val_rays, self.val_rgbs = [], []
        for frame in frames:
            c2w = np.array(frame["transform_matrix"], dtype=np.float64)[:3, :4]
            img = load_image(
                os.path.join(self.root_dir, frame["file_path"] + ".png"),
                self.img_wh,
                blend_alpha_to_white=True,
            )
            self.val_rays.append(pack_rays_np(self.directions, c2w, NEAR, FAR))
            self.val_rgbs.append(img.reshape(-1, 3))
        self.length = len(frames)

    # ---------------------------------------------------------------- helpers
    def _load_meta(self, which: str) -> dict:
        with open(os.path.join(self.root_dir, f"transforms_{which}.json")) as f:
            return json.load(f)

    def _load_depth(self, img_path: str, depth_type: str) -> np.ndarray:
        """depth_nerf/<frame>.npy ('nerf') or my_testset gt variant
        (blender_rot3d.py:338-356)."""
        base = os.path.basename(img_path)
        if depth_type == "nerf":
            path = os.path.join(
                self.root_dir, "depth_nerf", base.replace(".png", ".npy")
            )
            depth = np.load(path).astype(np.float32)
        elif depth_type == "gt":
            path = os.path.join(
                self.root_dir, "my_testset", base.replace(".png", "_400.npy")
            )
            depth = np.load(path).astype(np.float32)
            depth[depth > 1000] = 0
            if depth.ndim == 3:
                depth = depth[:, :, 0]
        else:
            path = os.path.join(
                self.root_dir, "depth", base.replace(".png", ".npy")
            )
            depth = np.load(path).astype(np.float32)
        return depth


class BlenderProj(BlenderRot3D):
    """Pseudo views are 60 rot_z interpolations over linspace(-angle, angle)
    (blender_ray_patch_1image_proj.py:355-356); no per-item fresh warp."""

    dataset_name = "blender_ray_patch_1image_proj"
    pseudo_mode = "proj"

    def _pseudo_bank(self, ref_c2w) -> np.ndarray:
        # the rot3d bank used to be built via super() and thrown away —
        # doubling the (device-warped) dataset init; the hook builds only
        # the 60-pose rot_z line (blender_proj.py:355-356)
        return pose_np.rot_z_linspace(ref_c2w, self.angle, 60)

    def _sampler_cfg(self, h, w, patch_size, sW, sH, num_rays) -> SamplerConfig:
        """proj batch composition differs from rot3d
        (blender_proj.py:440-476): the random-ray draw is num nonzero PLUS
        num any-pixel rays (2*num total, vs rot3d's num//10 split of num),
        the proj-ray draw stays at num, the real patch is rejected on
        ``mean > 0.01``, and the warp patch is a single unrejected draw."""
        return SamplerConfig(
            height=h,
            width=w,
            psx=patch_size,
            psy=patch_size,
            s_row=sW,
            s_col=sH,
            num_rays=2 * num_rays,
            n_any=num_rays,
            n_proj=num_rays,
            fresh_warp=False,
            angle=self.angle,
            reject_real_patch="mean_gt_001",
            reject_warp_patch=False,
        )
