"""The SinNeRF training step as one pure, jittable function.

Parity target: ``SinNeRF.training_step`` (``models/sinnerf.py:271-554``) with
its 7 loss families, BUT restructured TPU-first:

* The 4 ray bundles (random rays / ref patch / pseudo-view patch / projected
  rays) are **concatenated and rendered in a single pass** — the reference
  runs 4 chunked forwards, and under its dual-optimizer Lightning setup runs
  all of them TWICE per batch (once per optimizer_idx).  Here G and D both
  update from one render: the D loss sees ``stop_gradient`` renders, the G
  adversarial term sees ``stop_gradient`` D params.  Same update semantics
  (G and D each step once per batch), half the reference's FLOPs.
* All randomness (sample jitter, sigma noise, DiffAugment coins, ViT-feature
  refresh) derives from one step key.
* Known reference bugs NOT reproduced (documented): the (N,)-vs-(N,1)
  broadcast in the random-ray depth loss (``sinnerf.py:318``) is computed
  elementwise here.
* DDP-exact batch semantics: the reference runs batch_size=1 per DDP rank and
  averages gradients, so masked depth losses and the ViT CLS loss are
  computed PER ITEM and then meaned over the batch axis (not pooled) — a
  global batch of N on an N-device mesh reproduces N reference ranks.  The
  cached ViT reference feature is correspondingly per-item, shape (B, 384)
  (``sinnerf.py:272-275`` caches per rank).

Loss schema and weighting mirror ``sinnerf.py:492-509``:
  total = loss_g.tot + dis_weight*loss_d + depth_weight*loss_depth
        + proj_weight*depth_weight*loss_side_depth + vit_weight*loss_vit
        + depth_smooth_weight*loss_depth_smooth
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from sinnerf_tpu.losses.depth import (
    inverse_depth_smoothness_loss,
    smooth_l1_masked,
    smooth_l1_masked_per_item,
)
from sinnerf_tpu.losses.gan import d_loss as gan_d_loss
from sinnerf_tpu.losses.gan import g_loss as gan_g_loss
from sinnerf_tpu.losses.photometric import loss_dict
from sinnerf_tpu.models.diffaug import diff_augment
from sinnerf_tpu.models.discriminator import discriminator_apply
from sinnerf_tpu.models.vit import vit_preprocess, vit_tokens
from sinnerf_tpu.render.renderer import RenderSettings, render_rays
from sinnerf_tpu.utils.metrics import psnr


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static per-run configuration (maps 1:1 onto opt.py flags)."""

    render: RenderSettings
    dataset_name: str = "blender_ray_patch_1image_rot3d"
    loss_type: str = "mse"
    patch_loss: str = "mse"
    dloss: str = "hinge"  # opt.py:98
    depth_weight: float = 0.05
    vit_weight: float = 0.0
    dis_weight: float = 0.0
    proj_weight: float = 1.0
    depth_smooth_weight: float = 0.0
    depth_anneal: bool = False
    load_depth: bool = True
    imsize: int = 64  # discriminator branch selector (= patch_size)
    policy: str = "color,cutout"
    vit_refresh_prob: float = 0.05  # sinnerf.py:273

    @property
    def is_dtu(self) -> bool:
        return self.dataset_name == "dtu_proj"

    @property
    def is_blender(self) -> bool:
        return "blender" in self.dataset_name


class TrainState(NamedTuple):
    params: Dict[str, Any]  # {'coarse','fine'} NeRF pytrees
    opt_g: Any
    d_params: Optional[Dict[str, Any]]
    sn_state: Optional[Dict[str, Any]]
    opt_d: Optional[Any]
    vit_params: Optional[Dict[str, Any]]  # frozen
    ref_feature: Optional[jnp.ndarray]  # cached per-item CLS features (B, 384)
    vgg_params: Optional[Dict[str, Any]]  # frozen (l2_vgg patch loss)
    step: jnp.ndarray
    # per-item cache-validity flag (B,) bool: False forces a ViT refresh on
    # the next step.  An explicit flag rather than an all-zeros sentinel on
    # ref_feature — a legitimately zero CLS row must not re-trigger refresh.
    ref_feature_valid: Optional[jnp.ndarray] = None


def _flat(x, c):
    return x.reshape(-1, c)


def _imgify(flat, b, c, p, q):
    """(b*p*q, c) -> (b, c, p, q) like the reference's rearranges."""
    return flat.reshape(b, p, q, c).transpose(0, 3, 1, 2)


def _vit_cls_batch(vit_params, x):
    """(B, 3, H, W) -> (B, 384) final-block CLS tokens."""
    tokens = vit_tokens(vit_params, vit_preprocess(x))
    return tokens[-1][:, 0, :]


def compute_losses(
    g_params: Dict[str, Any],
    d_params,
    sn_state,
    vit_params,
    ref_feature,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    epoch: jnp.ndarray,
    cfg: TrainConfig,
    vgg_params=None,
    ref_feature_valid=None,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Return (total scalar loss, aux dict with metrics/new sn state)."""
    b, n_rand = batch["rays"].shape[:2]
    psx, psy = batch["real_patch"].shape[-2:]

    keys = jax.random.split(key, 6)
    loss_fn = loss_dict[cfg.loss_type]
    patch_loss_fn = loss_dict[cfg.patch_loss]
    # The VGG extractor binds ONLY to the patch loss: the random-ray loss
    # feeds flat (N, 3) bundles, on which the reference's own
    # --loss_type l2_vgg crashes (losses.py:129 F.interpolate needs images),
    # and 1-channel depth patches would crash torchvision VGG16 the same
    # way.  The trainer rejects loss_type='l2_vgg' up front (loop.py).
    depth_patch_loss_fn = patch_loss_fn
    if vgg_params is not None and cfg.patch_loss == "l2_vgg":
        from sinnerf_tpu.models.vgg import make_vgg_features

        patch_loss_fn = partial(
            patch_loss_fn, vgg_features=make_vgg_features(vgg_params)
        )

    # ---- single fused render over all 4 bundles ---------------------------
    rays = _flat(batch["rays"], 8)
    rays_full = _flat(batch["depth_ray"], 8)  # ref-view patch (sinnerf.py:282)
    rays_side = _flat(batch["rays_full"], 8)  # pseudo-view patch (:285)
    rays_proj = _flat(batch["rays_proj"], 8)
    sizes = [rays.shape[0], rays_full.shape[0], rays_side.shape[0], rays_proj.shape[0]]
    all_rays = jnp.concatenate([rays, rays_full, rays_side, rays_proj], axis=0)

    rendered = render_rays(g_params, all_rays, keys[0], cfg.render)
    offs = [0]
    for s in sizes:
        offs.append(offs[-1] + s)

    def split(i):
        return {k: v[offs[i] : offs[i + 1]] for k, v in rendered.items()}

    results, results_full, results_side, results_proj = (split(i) for i in range(4))

    rgbs = _flat(batch["rgbs"], 3)
    depth = _flat(batch["depth"], 1)[:, 0]
    depth_proj = _flat(batch["depth_proj"], 1)[:, 0]
    rgbs_full_img = _imgify(_flat(batch["depth_ray_rgb"], 3), b, 3, psx, psy)
    real_patch = batch["real_patch"]  # (B, 3, psx, psy)

    # ---- depth losses on random + projected rays (sinnerf.py:310-319) -----
    loss_depth = (
        smooth_l1_masked(results_proj["depth_fine"], depth_proj, use_mask=False)
        + smooth_l1_masked(results_proj["depth_coarse"], depth_proj, use_mask=False)
        + smooth_l1_masked(results["depth_fine"], depth, use_mask=False)
        + smooth_l1_masked(results["depth_coarse"], depth, use_mask=False)
    )

    # ---- photometric losses ----------------------------------------------
    loss_g = dict(loss_fn(results, rgbs))
    full_imgs = {
        "rgb_coarse": _imgify(results_full["rgb_coarse"], b, 3, psx, psy),
        "rgb_fine": _imgify(results_full["rgb_fine"], b, 3, psx, psy),
    }
    side_imgs = {
        "rgb_coarse": _imgify(results_side["rgb_coarse"], b, 3, psx, psy),
        "rgb_fine": _imgify(results_side["rgb_fine"], b, 3, psx, psy),
    }
    rgb_loss = patch_loss_fn(full_imgs, rgbs_full_img)
    for k, v in rgb_loss.items():
        loss_g[k] = loss_g[k] + v if k in loss_g else v

    # ---- ViT semantic loss on the pseudo view (sinnerf.py:332-338) --------
    if cfg.vit_weight > 0:
        # ref_ is recomputed on the first step and refreshed with prob 0.05
        # thereafter (sinnerf.py:272-275).  The reference caches it per DDP
        # rank (= per item at batch_size 1), so the cache is (B, 384) with an
        # independent refresh coin per item.  "Uninitialized" is tracked by
        # the explicit ref_feature_valid flag, not a zeros sentinel — a
        # legitimately all-zero CLS row must not force refresh forever.
        if ref_feature_valid is None:  # legacy callers: the old zeros sentinel
            first = jnp.all(ref_feature == 0, axis=1, keepdims=True)
        else:
            first = ~ref_feature_valid[:, None]  # (B, 1)
        coin = jax.random.bernoulli(keys[1], cfg.vit_refresh_prob, (b, 1))
        refresh = coin | first
        # the ~0.95 of steps that refresh no item skip the ViT forward
        # entirely (lax.cond executes one branch at runtime)
        fresh = jax.lax.cond(
            jnp.any(refresh),
            lambda: jax.lax.stop_gradient(_vit_cls_batch(vit_params, real_patch)),
            lambda: jnp.zeros((b, 384), real_patch.dtype),
        )
        ref_feat = jnp.where(refresh, fresh, ref_feature)
        # one batched ViT call for both rendered patches (halves launch count)
        sem = _vit_cls_batch(
            vit_params,
            jnp.concatenate([side_imgs["rgb_coarse"], side_imgs["rgb_fine"]], axis=0),
        )
        sem_coarse, sem_fine = sem[:b], sem[b:]
        # per-item MSE then batch mean == pooled mean (equal feature dims)
        loss_vit = jnp.mean((sem_coarse - ref_feat) ** 2) + jnp.mean(
            (sem_fine - ref_feat) ** 2
        )
        if ref_feature_valid is None:
            new_ref_valid = None
        else:
            new_ref_valid = ref_feature_valid | refresh[:, 0]
    else:
        ref_feat = ref_feature
        new_ref_valid = ref_feature_valid
        loss_vit = jnp.zeros(())

    # ---- patch depth supervision (sinnerf.py:354-387) ---------------------
    depth_gt_img = batch["depth_gt"].reshape(b, psx, psy)
    full_depth_fine = results_full["depth_fine"].reshape(b, psx, psy)
    full_depth_coarse = results_full["depth_coarse"].reshape(b, psx, psy)
    if cfg.is_dtu:
        loss_depth = loss_depth + smooth_l1_masked_per_item(
            full_depth_fine.reshape(b, -1), depth_gt_img.reshape(b, -1)
        )
        loss_depth = loss_depth + smooth_l1_masked_per_item(
            full_depth_coarse.reshape(b, -1), depth_gt_img.reshape(b, -1)
        )
    else:
        dpatch = depth_patch_loss_fn(
            {
                "rgb_fine": full_depth_fine[:, None],
                "rgb_coarse": full_depth_coarse[:, None],
            },
            depth_gt_img[:, None],
        )
        loss_depth = loss_depth + dpatch["tot"]
        # every-10-step scalars at sinnerf.py:375-381 (tag parity); emitted
        # each step here — the host loop decides the logging cadence
        depth_patch_metrics = {"train/depth_l2": dpatch["l2"]}
        if "ssim" in dpatch:
            depth_patch_metrics["train/depth_ssim"] = dpatch["ssim"]

    loss_depth_smooth = inverse_depth_smoothness_loss(
        full_depth_fine[:, None], full_imgs["rgb_fine"]
    ) + inverse_depth_smoothness_loss(
        full_depth_coarse[:, None], full_imgs["rgb_fine"]
    )

    if cfg.is_dtu:
        depth_patch_metrics = {}

    if cfg.is_blender:
        need_zero = depth_gt_img.reshape(b, -1) == 0
        loss_depth = loss_depth + 2.0 * smooth_l1_masked_per_item(
            full_depth_coarse.reshape(b, -1), depth_gt_img.reshape(b, -1), mask=need_zero
        )
        loss_depth = loss_depth + 2.0 * smooth_l1_masked_per_item(
            full_depth_fine.reshape(b, -1), depth_gt_img.reshape(b, -1), mask=need_zero
        )

    # ---- pseudo-view depth losses (sinnerf.py:389-406) --------------------
    side_depth_fine = results_side["depth_fine"].reshape(b, psx, psy)
    side_depth_coarse = results_side["depth_coarse"].reshape(b, psx, psy)
    loss_depth_smooth = (
        loss_depth_smooth
        + inverse_depth_smoothness_loss(side_depth_coarse[:, None], side_imgs["rgb_fine"])
        + inverse_depth_smoothness_loss(side_depth_fine[:, None], side_imgs["rgb_fine"])
    )
    warp_depth = batch["warp_patch_depth"].reshape(b, psx, psy)
    depth_mask = warp_depth > 0
    loss_side_depth = smooth_l1_masked_per_item(
        side_depth_coarse, warp_depth, mask=depth_mask
    ) + smooth_l1_masked_per_item(side_depth_fine, warp_depth, mask=depth_mask)

    # ---- adversarial losses (sinnerf.py:445-487) --------------------------
    new_sn = sn_state
    if cfg.dis_weight > 0:
        fake_img = side_imgs["rgb_fine"]
        d_apply = partial(
            discriminator_apply, policy=cfg.policy, imsize=cfg.imsize
        )
        # G term: frozen D params, SN state advanced by this call first
        d_frozen = jax.lax.stop_gradient(d_params)
        pred_fake_g, sn1 = d_apply(d_frozen, sn_state, fake_img, key=keys[2])
        g_pred_real = None
        if cfg.dloss == "relavistic":
            # the reference's G branch runs its own D(DiffAugment(real))
            # forward (sinnerf.py:454) — an explicit outer augmentation
            # (with diff_aug.py:14's 50% skip) on top of D's internal coin,
            # advancing the power iteration one extra time per batch
            k_coin, k_aug, k_d = jax.random.split(keys[5], 3)
            aug = diff_augment(real_patch, k_aug, cfg.policy)
            x_real_g = jnp.where(
                jax.random.bernoulli(k_coin, 0.5), aug, real_patch
            )
            g_pred_real, sn1 = d_apply(d_frozen, sn1, x_real_g, key=k_d)
        # D terms: live D params, detached renders
        if cfg.dloss == "wgan_gp":
            # R1 penalty differentiated through the EXACT pred_real forward
            # (same augmentation key, same incoming SN state), second-order
            # like the reference's create_graph=True compute_grad2.  NOTE:
            # the reference's own wgan_gp branch CRASHES as shipped —
            # real_patch never gets requires_grad_() before
            # compute_grad2(pred_real, real_patch) (sinnerf.py:465,487), so
            # autograd.grad raises; this is the working superset.
            def _real_fwd(x):
                out, sn_after = d_apply(d_params, sn1, x, key=keys[3])
                return jnp.sum(out), (out, sn_after)

            grads_x, (pred_real, sn2) = jax.grad(_real_fwd, has_aux=True)(
                real_patch
            )
        else:
            pred_real, sn2 = d_apply(d_params, sn1, real_patch, key=keys[3])
        pred_fake_d, new_sn = d_apply(
            d_params, sn2, jax.lax.stop_gradient(fake_img), key=keys[4]
        )
        loss_d_g = gan_g_loss(
            pred_fake_g,
            cfg.dloss,
            pred_real=(
                jax.lax.stop_gradient(g_pred_real)
                if g_pred_real is not None
                else jax.lax.stop_gradient(pred_real)
            ),
        )
        loss_d_d = gan_d_loss(pred_real, pred_fake_d, cfg.dloss)
        if cfg.dloss == "wgan_gp":
            gp = jnp.mean(jnp.sum(grads_x.reshape(b, -1) ** 2, axis=1))
            loss_d_d = loss_d_d + 10.0 * gp
    else:
        loss_d_g = jnp.zeros(())
        loss_d_d = jnp.zeros(())

    # ---- total (sinnerf.py:492-509) ---------------------------------------
    if not cfg.load_depth:
        raise NotImplementedError("reference requires --load_depth (sinnerf.py:502)")
    if cfg.depth_anneal:
        dw = jnp.maximum(
            cfg.depth_weight - epoch / (500.0 / cfg.depth_weight), 1.0
        )
    else:
        dw = cfg.depth_weight

    total = (
        loss_g["tot"]
        + cfg.dis_weight * (loss_d_g + loss_d_d)
        + dw * loss_depth
        + cfg.proj_weight * cfg.depth_weight * loss_side_depth
        + cfg.vit_weight * loss_vit
        + cfg.depth_smooth_weight * loss_depth_smooth
    )

    psnr_ = psnr(results["rgb_fine"], rgbs)
    metrics = {
        "train/loss": total,
        "train/loss_g": loss_g["tot"],
        "train/loss_vit": loss_vit,
        "train/loss_d": loss_d_d,
        "train/loss_g_adv": loss_d_g,
        "train/loss_depth": loss_depth,
        "train/loss_depth_smooth": loss_depth_smooth,
        "train/loss_side_depth": loss_side_depth,
        "train/psnr": psnr_,
        "train/depth_min": jnp.min(results_full["depth_fine"]),
        "train/depth_max": jnp.max(results_full["depth_fine"]),
        **depth_patch_metrics,
    }
    if "ssim" in loss_g:  # sinnerf.py:379-381
        metrics["train/ssim"] = loss_g["ssim"]

    # white-filled warp patch for the side image stack (sinnerf.py:303-305)
    warp_mask = jnp.sum(batch["warp_patch"], axis=1, keepdims=True) > 0
    side_rgb = jnp.where(warp_mask, batch["warp_patch"], 1.0)

    aux = {
        "metrics": metrics,
        "sn_state": new_sn,
        "ref_feature": ref_feat,
        "ref_feature_valid": new_ref_valid,
        "images": {
            "real_patch": real_patch,
            "rgb_coarse_full": full_imgs["rgb_coarse"],
            "rgb_fine_full": full_imgs["rgb_fine"],
            "side_rgb": side_rgb,
            "rgb_coarse_side": side_imgs["rgb_coarse"],
            "rgb_fine_side": side_imgs["rgb_fine"],
            "depth_coarse_side": side_depth_coarse,
            "depth_fine_side": side_depth_fine,
            "warp_depth": warp_depth,
        },
    }
    return total, aux


@partial(jax.jit, static_argnames=("cfg", "opt_g", "opt_d"), donate_argnums=(0,))
def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    epoch: jnp.ndarray,
    cfg: TrainConfig,
    opt_g: optax.GradientTransformation,
    opt_d: Optional[optax.GradientTransformation] = None,
) -> Tuple[TrainState, Dict[str, Any]]:
    """One optimization step: renders once, updates G (and D when enabled)."""

    def scalar_loss(g_params, d_params):
        return compute_losses(
            g_params,
            d_params,
            state.sn_state,
            state.vit_params,
            state.ref_feature,
            batch,
            key,
            epoch,
            cfg,
            vgg_params=state.vgg_params,
            ref_feature_valid=state.ref_feature_valid,
        )

    if cfg.dis_weight > 0:
        (total, aux), (g_grads, d_grads) = jax.value_and_grad(
            scalar_loss, argnums=(0, 1), has_aux=True
        )(state.params, state.d_params)
        g_updates, new_opt_g = opt_g.update(g_grads, state.opt_g, state.params)
        new_params = optax.apply_updates(state.params, g_updates)
        d_updates, new_opt_d = opt_d.update(d_grads, state.opt_d, state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)
    else:
        (total, aux), g_grads = jax.value_and_grad(scalar_loss, has_aux=True)(
            state.params, state.d_params
        )
        g_updates, new_opt_g = opt_g.update(g_grads, state.opt_g, state.params)
        new_params = optax.apply_updates(state.params, g_updates)
        new_d_params, new_opt_d = state.d_params, state.opt_d

    new_state = TrainState(
        params=new_params,
        opt_g=new_opt_g,
        d_params=new_d_params,
        sn_state=aux["sn_state"],
        opt_d=new_opt_d,
        vit_params=state.vit_params,
        ref_feature=aux["ref_feature"],
        vgg_params=state.vgg_params,
        step=state.step + 1,
        ref_feature_valid=aux["ref_feature_valid"],
    )
    return new_state, {"metrics": aux["metrics"], "images": aux["images"]}
