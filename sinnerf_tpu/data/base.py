"""Shared machinery for the single-image training datasets.

Each dataset builds, once per run:
* a host-side description (poses, intrinsics, near/far) parsed with numpy,
* a device-resident **scene array bundle** (reference image/depth/rays, ray
  pools, pseudo-view warp banks, and the flat valid-warped-pixel index), and
* a static ``SamplerConfig``.

Training batches then come from the jitted ``sample_batch`` — there are no
DataLoader worker processes and no per-step host preprocessing (SURVEY.md §3.5:
the reference spends minutes of single-threaded Python here).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sinnerf_tpu.data.sampler import (
    SamplerConfig,
    sample_batch,
    sample_batches_prefetch,
)
from sinnerf_tpu.ops.warp import forward_warp


def build_warp_banks(
    ref_image: np.ndarray,
    ref_depth: np.ndarray,
    ref_proj: np.ndarray,
    src_projs: np.ndarray,
    zbuffer: bool,
) -> Tuple[np.ndarray, np.ndarray]:
    """Warp the reference RGB-D into every pseudo pose (device scatter, one
    pose at a time via lax.map to bound memory).  Returns
    (bank_rgb (P, H, W, 3), bank_depth (P, H, W)) as numpy."""
    img = jnp.asarray(ref_image)
    dep = jnp.asarray(ref_depth)
    ref_p = jnp.asarray(ref_proj, dtype=jnp.float32)

    def one(src_p):
        return forward_warp(img, dep, ref_p, src_p, zbuffer=zbuffer)

    rgb, depth = jax.lax.map(one, jnp.asarray(src_projs, dtype=jnp.float32))
    return np.asarray(rgb), np.asarray(depth)


def build_proj_index(
    bank_rgb: np.ndarray, bank_depth: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten the warp banks into the valid-pixel sampling index:
    (pose_idx (V,), pix_idx (V,), depth (V,)).  Validity is the reference's
    rgb-sum-nonzero hole mask (blender_rot3d.py:402)."""
    p, h, w, _ = bank_rgb.shape
    valid = bank_rgb.reshape(p, h * w, 3).sum(-1) != 0
    pose_idx, pix_idx = np.nonzero(valid)
    depth = bank_depth.reshape(p, h * w)[pose_idx, pix_idx]
    return (
        pose_idx.astype(np.int32),
        pix_idx.astype(np.int32),
        depth.astype(np.float32),
    )


def pack_rays_np(
    directions: np.ndarray, c2w: np.ndarray, near: float, far: float
) -> np.ndarray:
    """Host-side [o, d, near, far] packing; directions (..., 3), c2w (3, 4)."""
    d = directions.reshape(-1, 3) @ np.asarray(c2w)[:3, :3].T
    o = np.broadcast_to(np.asarray(c2w)[:3, 3], d.shape)
    nf = np.broadcast_to(np.array([near, far], np.float32), (d.shape[0], 2))
    return np.concatenate([o, d, nf], axis=-1).astype(np.float32)


class SingleImageDataset:
    """Base class: holds the scene bundle + sampler config and exposes the
    train/val API the trainer consumes.  Subclasses populate ``self.scene``
    (dict of jnp arrays), ``self.cfg`` (SamplerConfig), ``self.white_back``,
    ``self.val_rays``/``self.val_rgbs`` lists, and ``self.length``."""

    white_back: bool = False
    scene: Dict[str, jnp.ndarray]
    cfg: SamplerConfig
    length: int = 1

    def __len__(self) -> int:
        return self.length

    def sample(self, key: jax.Array, step: int, batch_size: int = 1):
        return sample_batch(
            self.scene, key, jnp.asarray(step, jnp.int32), self.cfg, batch_size
        )

    def sample_many(self, keys: jax.Array, steps, batch_size: int = 1):
        """K per-step batches in one dispatch; leaves lead with (K, B, ...).
        Slice [j] equals ``sample(keys[j], steps[j])`` (bit-identical draws;
        <=1-ulp rounding on the fresh-warp depth, see sampler.py)."""
        return sample_batches_prefetch(
            self.scene,
            keys,
            jnp.asarray(steps, jnp.int32),
            self.cfg,
            batch_size,
        )

    # validation API -------------------------------------------------------
    # datasets whose val views come from real source images set val_fnames
    # so eval.py can name renders after them (reference eval.py:163-166;
    # emitted there by the classic LLFF loader's test_train split,
    # datasets/llff.py:391-392, and by the blender datasets for any split
    # ending in 'train', blender_rot3d.py:568-569 / blender_proj.py:536-537)
    val_fnames = None

    def val_len(self) -> int:
        return len(self.val_rays)

    def val_item(self, idx: int) -> Dict[str, np.ndarray]:
        item = {"rays": self.val_rays[idx]}
        if self.val_rgbs is not None and idx < len(self.val_rgbs):
            item["rgbs"] = self.val_rgbs[idx]
        if self.val_fnames is not None and idx < len(self.val_fnames):
            item["fname"] = self.val_fnames[idx]
        return item

    # helpers --------------------------------------------------------------
    @staticmethod
    def _finalize_scene(scene_np: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        return {k: jnp.asarray(v) for k, v in scene_np.items()}


def load_image(
    path: str,
    img_wh: Tuple[int, int],
    resample: str = "lanczos",
    blend_alpha_to_white: bool = False,
) -> np.ndarray:
    """Load + resize an image to (H, W, C) float32 in [0, 1]."""
    from PIL import Image

    img = Image.open(path)
    filt = Image.LANCZOS if resample == "lanczos" else Image.BILINEAR
    img = img.resize(img_wh, filt)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if blend_alpha_to_white and arr.shape[-1] == 4:
        rgb, a = arr[..., :3], arr[..., 3:]
        arr = rgb * a + (1.0 - a)
    elif arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    return arr[..., :3]
