"""On-device training-batch sampler.

Replaces the reference's 8-process torch DataLoader + per-item numpy sampling
(``blender_ray_patch_1image_rot3d.py:443-528``, ``llff...proj.py:619-669``,
``dtu_proj.py:594-654``) with a single jitted function: all random draws come
from one PRNG key, patch extraction is a dynamic_slice + static strided
slice, and the blender pipeline's fresh-pseudo-view warp runs as an
on-device scatter instead of host numpy.  The reference's
redraw-until-valid patch rejection loops are reproduced *exactly* (uniform
over the valid-origin set) without any per-step looping: the ref-image
predicate is static, so its valid origins are enumerated once at dataset
build (``compute_real_origins``); the fresh-warp predicate is evaluated for
every origin at once via separable slice-adds (``_strided_sum_map``) and the
draw indexes the k-th valid entry.

The emitted batch dict uses the reference's exact key schema (the keys
``training_step`` actually consumes — see SURVEY.md §2 item 4):

    rays (N, 8) | rgbs (N, 3) | depth (N, 1)          random ref-view rays
    rays_proj (N, 8) | depth_proj (N, 1)              warped pseudo-view rays
    real_patch (3, psx, psy)                          ref-image patch
    rays_full (psx*psy, 8)                            pseudo-view patch rays
    warp_patch (3, psx, psy) | warp_patch_depth (psx, psy)
    depth_ray (psx*psy, 8) | depth_gt (psx*psy, 1) | depth_ray_rgb (psx*psy, 3)

Unused-by-training keys of the reference loaders (side_proj, ref_proj,
side_coord, pose_real/fake, rgbs_proj) are intentionally not produced.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sinnerf_tpu.data import jnp_poses
from sinnerf_tpu.ops.warp import warp_winner


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampling configuration (one per dataset/recipe)."""

    height: int
    width: int
    psx: int  # patch rows (patch_size / patch_size_x)
    psy: int  # patch cols (patch_size / patch_size_y)
    s_row: int = 1  # row stride (reference sW strides the first spatial axis)
    s_col: int = 1  # col stride (reference sH)
    num_rays: int = 4096
    n_any: int = 0  # blender: num//10 rays drawn from the all-pixel pool
    n_proj: int = 0  # warped-ray draw count; 0 = num_rays (blender proj draws
    # 4096 proj rays while its random-ray total is 8192, blender_proj.py:464-502)
    fresh_warp: bool = False  # blender rot3d: new gaussian pseudo-view per item
    angle: int = 20
    reject_real_patch: str = "none"  # 'none' | 'max_nonzero' | 'mean_gt_001'
    reject_warp_patch: bool = False

    @property
    def row_limit(self) -> int:
        # np.random.randint(0, w - (ps-1)*s - 1) upper bound (exclusive)
        return self.height - (self.psx - 1) * self.s_row - 1

    @property
    def col_limit(self) -> int:
        return self.width - (self.psy - 1) * self.s_col - 1


def strided_patch(img: jnp.ndarray, ll, up, psx: int, psy: int, s_row: int, s_col: int):
    """img[ll : ll+(psx-1)*s+1 : s, up : ...] for img (H, W, ...).

    Lowered as a dynamic_slice of the contiguous span + a static strided
    slice: a 2-D ``img[rows[:,None], cols[None,:]]`` gather lowers to
    per-point loads on TPU (~60us each at recipe scale, and the rejection
    paths used to issue dozens), while dynamic_slice is one contiguous copy
    and the stride-6 downsample is a trivial static slice."""
    h_span = (psx - 1) * s_row + 1
    w_span = (psy - 1) * s_col + 1
    start = (ll, up) + (0,) * (img.ndim - 2)
    sizes = (h_span, w_span) + img.shape[2:]
    block = jax.lax.dynamic_slice(img, start, sizes)
    return block[::s_row, ::s_col]


def strided_patch_cm(img: jnp.ndarray, ll, up, psx: int, psy: int, s_row: int, s_col: int):
    """Channel-major variant of :func:`strided_patch`: img (C, H, W) ->
    (C, psx, psy), same dynamic_slice-of-span + static-stride lowering."""
    h_span = (psx - 1) * s_row + 1
    w_span = (psy - 1) * s_col + 1
    block = jax.lax.dynamic_slice(
        img, (0, ll, up), (img.shape[0], h_span, w_span)
    )
    return block[:, ::s_row, ::s_col]


def _doubling_strided_sum(x: jnp.ndarray, n: int, stride: int, axis: int, out: int):
    """``sum_{i<n} x[i*stride : i*stride + out]`` along ``axis`` in
    O(log n) shifted slice-adds: doubling builds sums over 2^k consecutive
    strided taps, and n's set bits pick which blocks to combine."""

    def sl(a, start, size):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(start, start + size)
        return a[tuple(idx)]

    # blocks[k] = sum over 2^k taps, kept just long enough for the final
    # combine: the block starting at tap t needs out + (n-1-t)*stride elems
    need = lambda taps_left: out + taps_left * stride
    blocks = []
    acc, cnt = x, 1
    while cnt <= n:
        blocks.append(acc)
        if 2 * cnt > n:
            break
        acc = sl(acc, 0, need(n - 2 * cnt)) + sl(
            acc, cnt * stride, need(n - 2 * cnt)
        )
        cnt *= 2
    total, tap = None, 0
    for k in reversed(range(len(blocks))):
        if n & (1 << k):
            part = sl(blocks[k], tap * stride, out)
            total = part if total is None else total + part
            tap += 1 << k
    return total


def _strided_sum_map(x: jnp.ndarray, cfg: SamplerConfig) -> jnp.ndarray:
    """(H, W) -> (row_limit, col_limit) map of strided-patch sums, computed
    separably (no gathers) with O(log psx + log psy) doubling slice-adds
    instead of psx + psy sequential ones (~128 at recipe patch sizes)."""
    acc = _doubling_strided_sum(x, cfg.psx, cfg.s_row, 0, cfg.row_limit)
    return _doubling_strided_sum(acc, cfg.psy, cfg.s_col, 1, cfg.col_limit)


def _uniform_valid_origin(key, valid: jnp.ndarray, cl: int):
    """Draw an origin uniformly over the True entries of ``valid``
    ((row_limit, col_limit) bool) — the same distribution as the reference's
    redraw-until-valid loop.  All-False degrades to origin (0, 0), whose
    patch is then all holes/zero-depth and fully masked downstream (the
    reference's loop would spin forever instead).  Reachable only when a
    multi-sigma Gaussian rotation clamps every splat onto the last image
    row/column (outside every patch window) — a <1e-4 tail per step."""
    flat = valid.reshape(-1)
    m = flat.sum()
    u = jax.random.randint(key, (), 0, jnp.maximum(m, 1))
    idx = jnp.argmax(jnp.cumsum(flat) > u)  # position of the (u+1)-th True
    return idx // cl, idx % cl


def compute_real_origins(
    ref_image: np.ndarray, cfg: SamplerConfig
) -> Optional[np.ndarray]:
    """Precompute the valid real-patch origins as a flat-encoded ``(M,)``
    int32 array (``ll * col_limit + up``), or None when the dataset has no
    real-patch rejection.

    The reference's rejection loop (blender_rot3d.py:451-460,
    dtu_proj.py:594-654) redraws a uniform origin until the patch passes, so
    the accepted origin is uniform over the *valid* set.  The ref image is
    static for the whole run, so that set can be enumerated once at dataset
    build and the per-step draw becomes one index lookup — exact rejection
    semantics (no all-invalid fallback) and none of the per-step candidate
    patch gathers.  "Exact" up to float32 summation order: the separable
    accumulation can round differently from a direct ``patch.mean()`` for a
    patch sitting exactly at the 0.01 threshold (~1e-7 relative — no real
    image puts a patch there).  Encoded flat rather than ``(M, 2)`` because HBM pads the
    minor dim to 128 lanes (a 2-wide array costs 64x its logical size).

    Validity is evaluated for every origin with separable strided
    reductions: ``red[r, c] = op_i img[r + i*s_row, c]`` then the same over
    columns — O(ps * H * W) host numpy, milliseconds at recipe scale.
    """
    if cfg.reject_real_patch == "none":
        return None
    rl, cl = cfg.row_limit, cfg.col_limit
    if cfg.reject_real_patch == "max_nonzero":
        red = ref_image.max(axis=-1)  # true max incl. channels
        op = np.maximum
    elif cfg.reject_real_patch == "mean_gt_001":
        red = ref_image.sum(axis=-1)
        op = np.add
    else:
        raise ValueError(cfg.reject_real_patch)
    acc = None
    for i in range(cfg.psx):
        sl = red[i * cfg.s_row : i * cfg.s_row + rl, :]
        acc = sl.copy() if acc is None else op(acc, sl)
    acc2 = None
    for j in range(cfg.psy):
        sl = acc[:, j * cfg.s_col : j * cfg.s_col + cl]
        acc2 = sl.copy() if acc2 is None else op(acc2, sl)
    if cfg.reject_real_patch == "max_nonzero":
        valid = acc2 != 0
    else:
        valid = acc2 / (cfg.psx * cfg.psy * ref_image.shape[-1]) > 0.01
    ll, up = np.nonzero(valid)
    if ll.size == 0:
        # the reference would spin forever here; fail loudly at build time
        raise ValueError(
            "no valid real-patch origin — every candidate patch fails "
            f"'{cfg.reject_real_patch}' (patch {cfg.psx}x{cfg.psy} "
            f"stride {cfg.s_row}x{cfg.s_col} on a {red.shape} image)"
        )
    return (ll * cl + up).astype(np.int32)


def _rays_from_dirs(dirs: jnp.ndarray, c2w: jnp.ndarray, near, far) -> jnp.ndarray:
    """Pack [o, d, near, far] for camera-frame dirs (..., 3) and c2w (3, 4)."""
    rays_d = dirs @ c2w[:, :3].T
    rays_o = jnp.broadcast_to(c2w[:, 3], rays_d.shape)
    nf = jnp.broadcast_to(jnp.stack([near, far]), rays_d.shape[:-1] + (2,))
    return jnp.concatenate([rays_o, rays_d, nf], axis=-1)


def sample_item(
    scene: Dict[str, jnp.ndarray],
    key: jax.Array,
    item_idx: jnp.ndarray,
    cfg: SamplerConfig,
) -> Dict[str, jnp.ndarray]:
    """Draw one training item.  ``scene`` is the array bundle built by the
    dataset classes (see sinnerf_tpu/data/blender.py etc.):

      ref_image (H,W,3), ref_depth (H,W), directions (H,W,3)
      pool (N,12) — main ray pool packed [o, d, near, far, rgb, depth];
      any (N,12) — blender's all-pixel pool, same packing;
      proj_pose/pix/depth — flat valid warped-pixel index;
      bank_c2w (P,3,4) pseudo poses (+ bank_rgb (P,3,H,W) / bank_depth
      (P,H,W) warp banks when fresh_warp=False); k3 (3,3), ref_c2w (3,4),
      near_far (2,).

    Layout note: persistent buffers avoid minor dims < 128 where a cheap
    alternative exists — TPU HBM pads the last dim to 128 lanes, so a
    resident (P,H,W,3) bank costs 42x its logical size and three separate
    (N,<12) pools cost three padded (N,128) blocks.  Banks are channel-major,
    the pools are packed into one (N,12) array, and the ref-view patch rays
    (``depth_ray``) are re-derived from the direction patch instead of
    keeping an (H,W,8) ray grid resident.  ``ref_image``/``directions`` stay
    (H,W,3): the per-pixel row gathers (step 2) and the forward warp need
    row-major pixels.
    """
    if cfg.reject_real_patch != "none" and "real_origins" not in scene:
        raise ValueError(
            f"cfg.reject_real_patch={cfg.reject_real_patch!r} but the scene "
            "has no 'real_origins' — the dataset must call "
            "compute_real_origins(ref_image, cfg) at build time"
        )
    keys = jax.random.split(key, 8)
    near, far = scene["near_far"][0], scene["near_far"][1]

    # ---- 1. random ref-view rays (main pool + optional any-pool mix) -------
    n_main = cfg.num_rays - cfg.n_any
    i_main = jax.random.randint(keys[0], (n_main,), 0, scene["pool"].shape[0])
    picked = scene["pool"][i_main]
    if cfg.n_any > 0:
        i_any = jax.random.randint(
            keys[1], (cfg.n_any,), 0, scene["any"].shape[0]
        )
        picked = jnp.concatenate([picked, scene["any"][i_any]])
    rays, rgbs, depth = picked[:, :8], picked[:, 8:11], picked[:, 11:12]

    # ---- 2. projected (warped pseudo-view) rays ----------------------------
    n_proj = cfg.n_proj if cfg.n_proj else cfg.num_rays
    j = jax.random.randint(
        keys[2], (n_proj,), 0, scene["proj_depth"].shape[0]
    )
    pose_idx = scene["proj_pose"][j]
    pix_idx = scene["proj_pix"][j]
    dirs_flat = scene["directions"].reshape(-1, 3)[pix_idx]  # (N, 3)
    c2ws = scene["bank_c2w"][pose_idx]  # (N, 3, 4)
    rays_d = jnp.einsum("nj,nij->ni", dirs_flat, c2ws[:, :, :3])
    rays_o = c2ws[:, :, 3]
    nf = jnp.broadcast_to(jnp.stack([near, far]), (n_proj, 2))
    rays_proj = jnp.concatenate([rays_o, rays_d, nf], axis=-1)
    depth_proj = scene["proj_depth"][j][:, None]

    # ---- 3. real (ref-image) patch with rejection --------------------------
    # validity depends only on the static ref image, so the valid-origin set
    # is enumerated once at dataset build (compute_real_origins) and the
    # draw is a single index lookup — exact reference rejection-loop
    # semantics with zero per-step candidate gathers
    if "real_origins" in scene:
        i_o = jax.random.randint(
            keys[3], (), 0, scene["real_origins"].shape[0]
        )
        code = scene["real_origins"][i_o]
        ll_r = code // cfg.col_limit
        up_r = code % cfg.col_limit
    else:  # no rejection: plain uniform origin
        k_ll, k_up = jax.random.split(keys[3])
        ll_r = jax.random.randint(k_ll, (), 0, cfg.row_limit)
        up_r = jax.random.randint(k_up, (), 0, cfg.col_limit)
    real_patch = strided_patch(
        scene["ref_image"], ll_r, up_r, cfg.psx, cfg.psy, cfg.s_row, cfg.s_col
    ).transpose(2, 0, 1)  # (3, psx, psy)

    # ---- 4. pseudo view: fresh gaussian warp (blender) or bank entry -------
    if cfg.fresh_warp:
        std = cfg.angle // 2
        xyz_deg = jax.random.normal(keys[4], (3,)) * std
        pseudo_c2w = jnp_poses.rotate_3d(scene["ref_c2w"], *xyz_deg)
        ref_p = jnp_poses.projection_matrix(
            scene["k3"], jnp_poses.c2w_to_w2c_cv(scene["ref_c2w"])
        )
        src_p = jnp_poses.projection_matrix(
            scene["k3"], jnp_poses.c2w_to_w2c_cv(pseudo_c2w)
        )
        # resolve collisions only (1-D ordinal scatter); the full warped RGB
        # image is never materialized — the depth map is needed whole (patch
        # validity sums it), but RGB is gathered later for just the chosen
        # patch's 4k pixels instead of all H*W
        h_img, w_img = scene["ref_depth"].shape
        win, d_flat = warp_winner(
            scene["ref_depth"], ref_p, src_p, zbuffer=False
        )
        win_map = win.reshape(h_img, w_img)
        warp_depth = jnp.where(
            win >= 0, d_flat[jnp.maximum(win, 0)], 0.0
        ).reshape(h_img, w_img)
    else:
        bank_i = item_idx % scene["bank_c2w"].shape[0]
        warp_rgb = scene["bank_rgb"][bank_i]  # channel-major (3, H, W)
        warp_depth = scene["bank_depth"][bank_i]
        pseudo_c2w = scene["bank_c2w"][bank_i]

    # ---- 5. pseudo-view patch (fake rays + warp rgb/depth), shared origin --
    if cfg.reject_warp_patch:
        # warp depth is freshly computed this step (rot3d), so the valid set
        # can't be precomputed — but it CAN be evaluated for every origin at
        # once with psx+psy separable slice-adds (far cheaper than candidate
        # patch gathers), making the draw exactly uniform over valid origins
        # like the reference's redraw loop (blender_rot3d.py:468-476)
        sums = _strided_sum_map(warp_depth, cfg)
        ll, up = _uniform_valid_origin(keys[5], sums != 0, cfg.col_limit)
    else:
        k_ll, k_up = jax.random.split(keys[5])
        ll = jax.random.randint(k_ll, (), 0, cfg.row_limit)
        up = jax.random.randint(k_up, (), 0, cfg.col_limit)
    args = (ll, up, cfg.psx, cfg.psy, cfg.s_row, cfg.s_col)
    # rays are elementwise per pixel, so pack them for the chosen patch only:
    # a full-image (H, W, 8) ray tensor would lane-pad 8 -> 128 in HBM (~82MB
    # materialized per step at 400^2) just to be strided-gathered right back
    dirs_patch = strided_patch(scene["directions"], *args)  # (psx, psy, 3)
    fake_patch = _rays_from_dirs(dirs_patch, pseudo_c2w, near, far).reshape(
        -1, 8
    )
    if cfg.fresh_warp:  # gather RGB for the patch's winners only
        win_p = strided_patch(win_map, *args)  # (psx, psy) int32
        rgb_flat = scene["ref_image"].reshape(-1, 3)
        wp = jnp.where(
            (win_p >= 0)[..., None], rgb_flat[jnp.maximum(win_p, 0)], 0.0
        )  # (psx, psy, 3) — forward_warp's hole/value semantics, patch-only
        warp_patch = wp.transpose(2, 0, 1)
    else:  # resident banks are channel-major (3, H, W)
        warp_patch = strided_patch_cm(warp_rgb, *args)  # (3, psx, psy)
    warp_patch_depth = strided_patch(warp_depth, *args)

    # ---- 6. ref-view patch at the same origin (depth supervision) ----------
    # the ref-view rays at the patch re-derive from the direction patch
    # already in registers — keeping an (H,W,8) ray grid resident would pad
    # 8 -> 128 lanes in HBM just to be strided-gathered here
    depth_ray = _rays_from_dirs(
        dirs_patch, scene["ref_c2w"], near, far
    ).reshape(-1, 8)
    depth_gt = strided_patch(scene["ref_depth"], *args).reshape(-1, 1)
    depth_ray_rgb = strided_patch(scene["ref_image"], *args).reshape(-1, 3)

    return {
        "rays": rays,
        "rgbs": rgbs,
        "depth": depth,
        "rays_proj": rays_proj,
        "depth_proj": depth_proj,
        "real_patch": real_patch,
        "rays_full": fake_patch,
        "warp_patch": warp_patch,
        "warp_patch_depth": warp_patch_depth,
        "depth_ray": depth_ray,
        "depth_gt": depth_gt,
        "depth_ray_rgb": depth_ray_rgb,
    }


@partial(jax.jit, static_argnames=("cfg", "batch_size"))
def sample_batch(
    scene: Dict[str, jnp.ndarray],
    key: jax.Array,
    step: jnp.ndarray,
    cfg: SamplerConfig,
    batch_size: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Draw a batch of ``batch_size`` items (vmapped) with a leading batch
    axis, mirroring the DataLoader collation the trainer expects."""
    keys = jax.random.split(key, batch_size)
    idxs = step * batch_size + jnp.arange(batch_size)
    return jax.vmap(lambda k, i: sample_item(scene, k, i, cfg))(keys, idxs)


@partial(jax.jit, static_argnames=("cfg", "batch_size"))
def sample_batches_prefetch(
    scene: Dict[str, jnp.ndarray],
    keys: jax.Array,
    steps: jnp.ndarray,
    cfg: SamplerConfig,
    batch_size: int = 1,
) -> Dict[str, jnp.ndarray]:
    """K steps' worth of :func:`sample_batch` in ONE device dispatch.

    ``keys`` is a (K,) key array (one per-step batch key, exactly the keys
    the per-step path would have used) and ``steps`` a (K,) int32; leaves
    come back with a leading (K, batch_size, ...) and slice [j] equals
    ``sample_batch(scene, keys[j], steps[j], ...)`` — bit-identical for
    every PRNG draw and index (ray picks, patch origins, warp winners);
    the lone exception is the fresh-warp projected depth value, where the
    K-batched compilation may reassociate the projection matmul chain by
    <=1 ulp (winner ordinals are depth-independent for the last-write warp,
    so only the float depth wiggles, never which source pixel won).

    Why: at recipe scale the per-step sampler costs ~5.8 ms of device time
    that is almost entirely fixed per-op overhead, not data movement (the
    ray-pool gathers move ~200 KB but cost 1.1 ms; the 160k-splat warp
    scatter moves 640 KB in 2.1 ms — both orders of magnitude off the HBM
    roofline).  Every draw is a pure function of (key, step), independent of
    training state, so K steps of sampling can be batched into one vmapped
    dispatch and the fixed overhead amortized K-fold.  The train loop
    prefetches within an epoch (train/loop.py) so checkpoint-boundary key
    state is unchanged.
    """
    def one(k, s):
        bkeys = jax.random.split(k, batch_size)
        idxs = s * batch_size + jnp.arange(batch_size)
        return jax.vmap(lambda kk, ii: sample_item(scene, kk, ii, cfg))(
            bkeys, idxs
        )

    return jax.vmap(one)(keys, steps)
