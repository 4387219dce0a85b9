"""Composed training-step loss parity vs the reference ``training_step``.

Every primitive (MLP, render_rays, sample_pdf, SL1, activations, DiffAugment,
ViT, GAN losses) already has a component golden test; this file measures the
7-loss ASSEMBLY of ``/root/reference/models/sinnerf.py:271-509`` end to end:
identical weights (our params exported into the reference torch NeRF),
identical batch (one sample from our on-device sampler, fed to both sides),
deterministic settings (perturb=0, noise_std=0).

pytorch-lightning / kornia / torchvision are not installed in this image, so
``models/sinnerf.py`` cannot be imported wholesale.  Instead the reference's
loss assembly is re-executed verbatim in torch here, importing the importable
reference modules (``models/rendering.py``, ``models/nerf.py``) and inlining
the two tiny helpers the missing packages provide:

* ``SL1Loss`` (``sinnerf.py:32-42``) — restated exactly, INCLUDING the
  ``depth_pred[mask]`` semantics where ``mask=None`` unsqueezes, which at
  ``sinnerf.py:318`` broadcasts (N,) against (N,1) into an (N,N) matrix.
* kornia ``inverse_depth_smoothness_loss`` — the published formula
  (edge-weighted absolute depth gradients), restated in torch.

Intentional deviations are measured, not just asserted:
* our random-ray depth terms are elementwise (the reference's as-executed
  (N,N) broadcast is also computed and shown to differ),
* everything else must agree to ~1e-3.

Coverage levels (all on identical weights + batches):
* VALUES   — the 7-loss assembly and its GAN/ViT branches,
* GRADIENTS — ∂total/∂{coarse, fine} and ∂total/∂D leaf-wise vs torch
  autograd through the graph-carrying re-execution,
* TRAJECTORY — params after 3 composed Adam steps, both optimizers,
* MOMENTS  — the stochastic path (perturb=1, noise_std=1) at the
  mean/spread level (RNG streams can't match pointwise).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from sinnerf_tpu.data.synthetic import make_blender_scene
from sinnerf_tpu.models.nerf import export_torch_state
from sinnerf_tpu.train.loop import SinNeRFTrainer
from sinnerf_tpu.train.step import compute_losses
from tests.reference_util import import_reference_module
from tests.test_train import _hparams


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return make_blender_scene(str(tmp_path_factory.mktemp("scene")), (64, 64))


def _deterministic_trainer(scene, tmp, **overrides):
    hp = _hparams(
        scene,
        tmp,
        perturb=0.0,
        noise_std=0.0,
        N_samples=8,
        N_importance=8,
        depth_weight=8.0,
        proj_weight=1.0,
        depth_smooth_weight=0.5,
        num_rays=64,
        patch_size=16,
        **overrides,
    )
    return SinNeRFTrainer(hp)


# --------------------------------------------------------------------- torch
def _torch_models(params):
    nerf_ref = import_reference_module("models.nerf")
    import torch

    models = []
    for name in ("coarse", "fine"):
        m = nerf_ref.NeRF(use_new_activation=True)
        state = {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in export_torch_state(params[name]).items()
        }
        m.load_state_dict(state, strict=True)
        m.eval()
        models.append(m)
    return models


def _ref_forward(models, rays_np, white_back, n_samples=8, n_importance=8,
                 perturb=0, noise_std=0):
    """The reference SinNeRF.forward chunk loop (sinnerf.py:171-193)."""
    rendering_ref = import_reference_module("models.rendering")
    nerf_ref = import_reference_module("models.nerf")
    import torch

    embeddings = [nerf_ref.Embedding(3, 10), nerf_ref.Embedding(3, 4)]
    out = rendering_ref.render_rays(
        models,
        embeddings,
        torch.from_numpy(rays_np),
        N_samples=n_samples,
        use_disp=False,
        perturb=perturb,
        noise_std=noise_std,
        N_importance=n_importance,
        chunk=1 << 20,
        white_back=white_back,
        test_time=False,
    )
    return out


def _sl1(pred, gt, mask=None, useMask=True):
    """SL1Loss verbatim (sinnerf.py:32-42): ``mask=None`` indexes with None
    (unsqueeze) — reproducing the reference's as-executed broadcasts."""
    import torch.nn.functional as F

    if mask is None and useMask:
        mask = gt > 0
    return F.smooth_l1_loss(pred[mask], gt[mask])


def _idsl(idepth, image):
    """kornia.losses.inverse_depth_smoothness_loss formula in torch."""
    import torch

    didx = idepth[..., :, :-1] - idepth[..., :, 1:]
    didy = idepth[..., :-1, :] - idepth[..., 1:, :]
    imdx = image[..., :, :-1] - image[..., :, 1:]
    imdy = image[..., :-1, :] - image[..., 1:, :]
    wx = torch.exp(-torch.mean(torch.abs(imdx), dim=-3, keepdim=True))
    wy = torch.exp(-torch.mean(torch.abs(imdy), dim=-3, keepdim=True))
    return torch.mean(torch.abs(didx * wx)) + torch.mean(torch.abs(didy * wy))


def _mse_loss_dict(results, targets):
    """losses.py:12-22 MSELoss."""
    import torch.nn.functional as F

    loss = F.mse_loss(results["rgb_coarse"], targets)
    if "rgb_fine" in results:
        loss = loss + F.mse_loss(results["rgb_fine"], targets)
    return {"tot": loss, "l2": loss}


def _reference_assembly_torch(models, batch_np, white_back, hp,
                              perturb=0, noise_std=0):
    """sinnerf.py:271-509 re-executed in torch for batch_size=1, mse/mse,
    dis=vit=0 — GRAPH-CARRYING (no torch.no_grad), so callers can backprop
    ``total_fixed`` through the reference render for composed gradient /
    trajectory goldens.  Returns torch tensors.

    Computes both the as-executed buggy random-ray depth term (the
    (N,)-vs-(N,1) broadcast at sinnerf.py:318) and the elementwise fixed
    variant this repo intentionally uses; ``total_fixed`` uses the fixed one.
    """
    import torch

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in batch_np.items()}
    psx, psy = t["real_patch"].shape[-2:]

    rays = t["rays"].reshape(-1, 8)
    rgbs = t["rgbs"].reshape(-1, 3)
    depth = t["depth"].reshape(-1, 1)
    rays_full = t["depth_ray"].reshape(-1, 8)
    # rearrange 'b (p q) c -> b c p q' (sinnerf.py:283)
    rgbs_full = t["depth_ray_rgb"].reshape(1, psx, psy, 3).permute(0, 3, 1, 2)
    rays_side = t["rays_full"].reshape(-1, 8)
    rays_proj = t["rays_proj"].reshape(-1, 8)
    depth_proj = t["depth_proj"].reshape(-1, 1).squeeze()

    results = _ref_forward(models, rays.numpy(), white_back,
                           hp.N_samples, hp.N_importance, perturb, noise_std)
    results_full = _ref_forward(models, rays_full.numpy(), white_back,
                                hp.N_samples, hp.N_importance, perturb, noise_std)
    results_side = _ref_forward(models, rays_side.numpy(), white_back,
                                hp.N_samples, hp.N_importance, perturb, noise_std)
    results_proj = _ref_forward(models, rays_proj.numpy(), white_back,
                                hp.N_samples, hp.N_importance, perturb, noise_std)

    # sinnerf.py:310-313 — proj terms, elementwise shapes
    loss_depth = _sl1(results_proj["depth_fine"], depth_proj, useMask=False)
    loss_depth = loss_depth + _sl1(
        results_proj["depth_coarse"], depth_proj, useMask=False
    )
    # sinnerf.py:317 — loss_g on random rays
    loss_g = _mse_loss_dict(results, rgbs)
    # sinnerf.py:318-319 — AS EXECUTED: (N,) vs (N,1) broadcast
    rand_buggy = _sl1(results["depth_fine"], depth, useMask=False) + _sl1(
        results["depth_coarse"], depth, useMask=False
    )
    # elementwise variant (what this repo intentionally computes)
    d1 = depth.squeeze()
    rand_fixed = _sl1(results["depth_fine"], d1, useMask=False) + _sl1(
        results["depth_coarse"], d1, useMask=False
    )

    # sinnerf.py:348-353 — patch photometric loss added into loss_g
    rf = {
        "rgb_coarse": results_full["rgb_coarse"].reshape(1, psx, psy, 3).permute(0, 3, 1, 2),
        "rgb_fine": results_full["rgb_fine"].reshape(1, psx, psy, 3).permute(0, 3, 1, 2),
    }
    rgb_loss = _mse_loss_dict(rf, rgbs_full)
    for k, v in rgb_loss.items():
        loss_g[k] = loss_g[k] + v

    # sinnerf.py:354-368 — patch depth supervision (blender branch)
    depth_gt = t["depth_gt"].reshape(1, psx, psy, 1).permute(0, 3, 1, 2)
    full_depth_fine = results_full["depth_fine"].reshape(1, 1, psx, psy)
    full_depth_coarse = results_full["depth_coarse"].reshape(1, 1, psx, psy)
    loss_depth_patch = _mse_loss_dict(
        {"rgb_fine": full_depth_fine, "rgb_coarse": full_depth_coarse},
        depth_gt,
    )
    loss_depth = loss_depth + loss_depth_patch["tot"]
    loss_depth_smooth = _idsl(full_depth_fine, rf["rgb_fine"]) + _idsl(
        full_depth_coarse, rf["rgb_fine"]
    )
    # sinnerf.py:383-387 — blender zero-depth (background) terms
    need_zero = depth_gt.reshape(-1, 1) == 0
    loss_depth = loss_depth + 2 * _sl1(
        full_depth_coarse.reshape(-1, 1), depth_gt.reshape(-1, 1), mask=need_zero
    )
    loss_depth = loss_depth + 2 * _sl1(
        full_depth_fine.reshape(-1, 1), depth_gt.reshape(-1, 1), mask=need_zero
    )
    # sinnerf.py:389-406 — pseudo-view smooth + masked side depth
    side_rgb_fine = results_side["rgb_fine"].reshape(1, psx, psy, 3).permute(0, 3, 1, 2)
    side_depth_fine = results_side["depth_fine"].reshape(1, 1, psx, psy)
    side_depth_coarse = results_side["depth_coarse"].reshape(1, 1, psx, psy)
    loss_depth_smooth = loss_depth_smooth + _idsl(side_depth_coarse, side_rgb_fine)
    loss_depth_smooth = loss_depth_smooth + _idsl(side_depth_fine, side_rgb_fine)
    warp_depth = t["warp_patch_depth"].reshape(psx, psy)
    depth_mask = warp_depth > 0
    if depth_mask.sum() > 0:
        loss_side_depth = _sl1(side_depth_coarse[0][0], warp_depth, depth_mask)
        loss_side_depth = loss_side_depth + _sl1(
            side_depth_fine[0][0], warp_depth, depth_mask
        )
    else:
        loss_side_depth = torch.zeros(())

    # sinnerf.py:492-509 totals (load_depth path, no anneal, dis=vit=0)
    dw = hp.depth_weight
    loss_depth_fixed = loss_depth + rand_fixed
    total_fixed = (
        loss_g["tot"]
        + dw * loss_depth_fixed
        + hp.proj_weight * dw * loss_side_depth
        + hp.depth_smooth_weight * loss_depth_smooth
    )
    return {
        "loss_g": loss_g["tot"],
        "loss_depth_fixed": loss_depth_fixed,
        "loss_depth_buggy": loss_depth + rand_buggy,
        "loss_depth_smooth": loss_depth_smooth,
        "loss_side_depth": loss_side_depth,
        "total_fixed": total_fixed,
        "results_side": results_side,
        "side_rgb_fine_img": side_rgb_fine,
    }


def _reference_training_step_losses(models, batch_np, white_back, hp):
    """Float view of ``_reference_assembly_torch`` under no_grad (the
    value-parity tests don't need the graph)."""
    import torch

    with torch.no_grad():
        res = _reference_assembly_torch(models, batch_np, white_back, hp)
    out = {
        k: float(res[k])
        for k in (
            "loss_g", "loss_depth_fixed", "loss_depth_buggy",
            "loss_depth_smooth", "loss_side_depth", "total_fixed",
        )
    }
    out["side_rgb_coarse"] = res["results_side"]["rgb_coarse"].numpy()
    out["side_rgb_fine"] = res["results_side"]["rgb_fine"].numpy()
    return out


def test_composed_training_step_matches_reference(scene, tmp_path):
    trainer = _deterministic_trainer(scene, str(tmp_path))
    hp = trainer.hparams
    batch = trainer.train_dataset.sample(jax.random.key(7), step=0, batch_size=1)
    batch_np = {k: np.asarray(v) for k, v in batch.items()}

    total, aux = compute_losses(
        trainer.state.params,
        None,
        None,
        None,
        None,
        batch,
        jax.random.key(11),
        jnp.asarray(0.0),
        trainer.cfg,
    )
    ours = {k: float(v) for k, v in aux["metrics"].items()}

    models = _torch_models(trainer.state.params)
    want = _reference_training_step_losses(
        models, batch_np, trainer.train_dataset.white_back, hp
    )

    # loss families that must agree with the reference's assembly
    np.testing.assert_allclose(
        ours["train/loss_g"], want["loss_g"], rtol=2e-3, atol=1e-4,
        err_msg="loss_g (photometric random-ray + patch)")
    np.testing.assert_allclose(
        ours["train/loss_depth_smooth"], want["loss_depth_smooth"],
        rtol=2e-3, atol=1e-4, err_msg="loss_depth_smooth")
    np.testing.assert_allclose(
        ours["train/loss_side_depth"], want["loss_side_depth"],
        rtol=2e-3, atol=1e-4, err_msg="loss_side_depth (masked warp SL1)")
    # depth family: ours == reference with the (N,)-vs-(N,1) broadcast FIXED
    np.testing.assert_allclose(
        ours["train/loss_depth"], want["loss_depth_fixed"],
        rtol=2e-3, atol=1e-4, err_msg="loss_depth (elementwise semantics)")
    np.testing.assert_allclose(
        ours["train/loss"], want["total_fixed"], rtol=2e-3, atol=5e-4,
        err_msg="total loss")

    # the as-executed broadcast variant is finite; on this synthetic scene
    # the GT depth is constant along rays so broadcast == elementwise — the
    # divergence itself is quantified on varied depths in
    # test_reference_broadcast_bug_quantified below
    assert np.isfinite(want["loss_depth_buggy"])


def test_reference_broadcast_bug_quantified():
    """sinnerf.py:318 as-executed: SmoothL1((N,), (N,1)) broadcasts to (N,N).
    Quantify that deviation on varied depths, and pin our elementwise
    semantics to the shape-corrected reference value."""
    import torch

    from sinnerf_tpu.losses.depth import smooth_l1_masked

    rng = np.random.default_rng(0)
    pred = rng.uniform(1.0, 5.0, size=(64,)).astype(np.float32)
    gt = rng.uniform(1.0, 5.0, size=(64, 1)).astype(np.float32)

    buggy = float(_sl1(torch.from_numpy(pred), torch.from_numpy(gt), useMask=False))
    fixed = float(
        _sl1(torch.from_numpy(pred), torch.from_numpy(gt).squeeze(), useMask=False)
    )
    ours = float(
        smooth_l1_masked(jnp.asarray(pred), jnp.asarray(gt[:, 0]), use_mask=False)
    )
    np.testing.assert_allclose(ours, fixed, rtol=1e-5)
    assert abs(buggy - fixed) > 1e-2, (
        f"broadcast deviation vanished unexpectedly: {buggy} vs {fixed}"
    )


def test_composed_vit_term_matches_reference_composition(scene, tmp_path):
    """The ViT branch of the composed step: the loss must be the CLS-feature
    MSE between the reference-rendered side images and the cached real-patch
    feature (sinnerf.py:272-275, 332-338).  The ViT forward itself is golden-
    tested against torch in test_gan_vit; here we verify WHAT is fed to it and
    how the cache/refresh composition works, using the same (random) ViT
    params on both sides."""
    trainer = _deterministic_trainer(scene, str(tmp_path), vit_weight=10.0)
    batch = trainer.train_dataset.sample(jax.random.key(3), step=0, batch_size=1)

    total, aux = compute_losses(
        trainer.state.params,
        None,
        None,
        trainer.state.vit_params,
        trainer.state.ref_feature,  # zeros -> first-step refresh
        batch,
        jax.random.key(5),
        jnp.asarray(0.0),
        trainer.cfg,
    )
    ours = float(aux["metrics"]["train/loss_vit"])

    # reference-side composition: render side view with torch, then apply the
    # (already golden-tested) ViT to the same inputs the reference would
    from sinnerf_tpu.models.vit import vit_preprocess, vit_tokens

    models = _torch_models(trainer.state.params)
    psx, psy = np.asarray(batch["real_patch"]).shape[-2:]
    side = _ref_forward(
        models, np.asarray(batch["rays_full"]).reshape(-1, 8),
        trainer.train_dataset.white_back,
        trainer.hparams.N_samples, trainer.hparams.N_importance,
    )

    def cls_feat(img_flat):
        img = jnp.asarray(img_flat.detach().numpy()).reshape(1, psx, psy, 3)
        img = img.transpose(0, 3, 1, 2)
        return vit_tokens(trainer.state.vit_params, vit_preprocess(img))[-1][:, 0, :]

    real = jnp.asarray(batch["real_patch"])
    ref_feat = vit_tokens(trainer.state.vit_params, vit_preprocess(real))[-1][:, 0, :]
    sem_c = cls_feat(side["rgb_coarse"])
    sem_f = cls_feat(side["rgb_fine"])
    want = float(jnp.mean((sem_c - ref_feat) ** 2) + jnp.mean((sem_f - ref_feat) ** 2))
    np.testing.assert_allclose(ours, want, rtol=5e-3, atol=1e-4)
    # the cache must now hold the real-patch feature (first-step refresh).
    # Inside compute_losses the refresh runs under lax.cond and fuses
    # differently than the eager call here -> ~1e-6 f32 reassociation drift.
    np.testing.assert_allclose(
        np.asarray(aux["ref_feature"]), np.asarray(ref_feat), rtol=1e-3, atol=1e-5
    )


def test_batch_grads_equal_mean_of_per_item_grads(scene, tmp_path):
    """DDP-exact batch semantics: grads of the global-batch-4 loss must equal
    the mean of the 4 single-item grads (the reference's num_gpus=4
    --batch_size 1 DDP configuration).  Deterministic settings; the ViT loss
    and every masked depth loss exercise the per-item paths."""
    trainer = _deterministic_trainer(scene, str(tmp_path), vit_weight=1.0,
                                     batch_size=4)
    b = 4
    batch = trainer.train_dataset.sample(jax.random.key(9), step=0, batch_size=b)
    key = jax.random.key(13)
    ref_feature = trainer.state.ref_feature  # (4, 384) zeros -> all refresh

    def loss_batch(params):
        return compute_losses(
            params, None, None, trainer.state.vit_params, ref_feature,
            batch, key, jnp.asarray(0.0), trainer.cfg,
        )[0]

    g_batch = jax.grad(loss_batch)(trainer.state.params)

    def item_grads(i):
        item = jax.tree_util.tree_map(lambda x: x[i : i + 1], batch)

        def loss_item(params):
            return compute_losses(
                params, None, None, trainer.state.vit_params,
                ref_feature[i : i + 1], item, key, jnp.asarray(0.0),
                trainer.cfg,
            )[0]

        return jax.grad(loss_item)(trainer.state.params)

    gs = [item_grads(i) for i in range(b)]
    g_mean = jax.tree_util.tree_map(lambda *x: sum(x) / b, *gs)

    flat_b, _ = jax.flatten_util.ravel_pytree(g_batch)
    flat_m, _ = jax.flatten_util.ravel_pytree(g_mean)
    np.testing.assert_allclose(
        np.asarray(flat_b), np.asarray(flat_m), rtol=1e-4, atol=1e-6,
        err_msg="batch-4 grads != mean of 4 per-item grads (DDP semantics)",
    )


def _grads_to_pytree(model):
    """Collect a torch NeRF's ``.grad``s into our param-pytree layout by
    running the named grad dict through ``import_torch_state`` (which owns
    the name map and the (out,in)->(in,out) transpose)."""
    import torch

    from sinnerf_tpu.models.nerf import import_torch_state

    grad_sd = {
        name: (p.grad if p.grad is not None else torch.zeros_like(p))
        for name, p in model.named_parameters()
    }
    return import_torch_state(grad_sd)


def _assert_tree_close(ours, want, rtol, atol, msg):
    leaves_o, treedef_o = jax.tree_util.tree_flatten(ours)
    leaves_w, treedef_w = jax.tree_util.tree_flatten(want)
    assert treedef_o == treedef_w, f"{msg}: tree structure mismatch"
    paths = jax.tree_util.tree_flatten_with_path(ours)[0]
    for (path, lo), lw in zip(paths, leaves_w):
        np.testing.assert_allclose(
            np.asarray(lo), np.asarray(lw), rtol=rtol, atol=atol,
            err_msg=f"{msg} at {jax.tree_util.keystr(path)}",
        )


def test_composed_gradients_match_reference(scene, tmp_path):
    """∂total/∂{coarse, fine} through the COMPOSED assembly: jax.grad of
    compute_losses vs torch autograd through the re-executed reference
    training_step (sinnerf.py:271-509), same weights, same batch,
    deterministic settings (dis=vit=0, elementwise depth semantics on both
    sides — the broadcast-bug deviation is excluded exactly as in the value
    test).  Component grad goldens (MLP, D, SN sigma) exist elsewhere; this
    pins the full render -> 7-loss -> backprop chain leaf-wise."""
    trainer = _deterministic_trainer(scene, str(tmp_path))
    hp = trainer.hparams
    batch = trainer.train_dataset.sample(jax.random.key(7), step=0, batch_size=1)
    batch_np = {k: np.asarray(v) for k, v in batch.items()}

    def total_loss(params):
        return compute_losses(
            params, None, None, None, None, batch,
            jax.random.key(11), jnp.asarray(0.0), trainer.cfg,
        )[0]

    ours = jax.grad(total_loss)(trainer.state.params)

    models = _torch_models(trainer.state.params)
    res = _reference_assembly_torch(
        models, batch_np, trainer.train_dataset.white_back, hp
    )
    res["total_fixed"].backward()

    for i, name in enumerate(("coarse", "fine")):
        want = _grads_to_pytree(models[i])
        # scale-aware atol: grads span ~6 orders of magnitude across layers
        gmax = max(
            float(np.abs(np.asarray(l)).max())
            for l in jax.tree_util.tree_leaves(want)
        )
        _assert_tree_close(
            ours[name], want, rtol=5e-3, atol=2e-4 * gmax,
            msg=f"d total / d {name}",
        )


def test_composed_d_gradients_match_reference(scene, tmp_path):
    """∂total/∂D through the composed step with identical imported D weights:
    our d_grads (= dis_weight * ∂loss_d/∂D, the G-adversarial term sees
    stop_gradient'ed D) must match torch autograd through the reference's
    optimizer_idx==1 branch (sinnerf.py:464-474,500) with the spectral-norm
    power iteration advanced in the same call order (fake_g, real, fake_d)
    and sigma differentiable exactly as torch's spectral_norm."""
    import dataclasses

    import torch

    from sinnerf_tpu.models.discriminator import import_torch_discriminator_state

    disc_ref = import_reference_module("models.discriminator")

    trainer = _deterministic_trainer(scene, str(tmp_path), dis_weight=0.01)
    cfg = dataclasses.replace(trainer.cfg, policy="")
    hp = trainer.hparams
    batch = trainer.train_dataset.sample(jax.random.key(21), step=0, batch_size=1)
    batch_np = {k: np.asarray(v) for k, v in batch.items()}

    torch.manual_seed(1)
    d_model = disc_ref.Discriminator(
        conditional=False, policy=None, ndf=64, imsize=hp.patch_size
    )
    d_model.train()
    d_params, sn = import_torch_discriminator_state(
        {k: v.detach().numpy() for k, v in d_model.state_dict().items()}
    )

    def d_total(dp):
        return compute_losses(
            trainer.state.params, dp, sn, None, None, batch,
            jax.random.key(22), jnp.asarray(0.0), cfg,
        )[0]

    ours_d_grads = jax.grad(d_total)(d_params)

    # torch side: render once (no G graph needed), then the three D forwards
    # in reference call order; loss scaled by dis_weight like the composed
    # total (sinnerf.py:500)
    models = _torch_models(trainer.state.params)
    with torch.no_grad():
        res = _reference_assembly_torch(
            models, batch_np, trainer.train_dataset.white_back, hp
        )
    fake = res["side_rgb_fine_img"].detach()
    real = torch.from_numpy(np.asarray(batch["real_patch"]))
    _ = d_model(fake)                      # optimizer_idx==0 forward (SN tick)
    pred_real = d_model(real)
    pred_fake_d = d_model(fake)
    loss_d = hp.dis_weight * (
        torch.relu(1.0 - pred_real).mean() + torch.relu(1.0 + pred_fake_d).mean()
    ) / 2
    loss_d.backward()

    grad_sd = {
        name: p.grad for name, p in d_model.named_parameters()
        if p.grad is not None
    }
    # named_parameters exposes the SN originals as main.<i>.weight_orig
    want_d_grads, _ = import_torch_discriminator_state(
        {
            **{k: v.detach().numpy() for k, v in grad_sd.items()},
            **{
                k: v.detach().numpy()
                for k, v in d_model.state_dict().items()
                if k.endswith("weight_u")
            },
        }
    )
    gmax = max(
        float(np.abs(np.asarray(l)).max())
        for l in jax.tree_util.tree_leaves(want_d_grads)
    )
    _assert_tree_close(
        ours_d_grads, want_d_grads, rtol=5e-3, atol=2e-4 * gmax,
        msg="d total / d D",
    )


def test_composed_adam_trajectory_matches_reference(scene, tmp_path):
    """3-step composed Adam TRAJECTORY golden, both optimizers: params after
    3 train_steps (G at lr, D at 0.2x lr, hinge GAN on, DiffAugment off,
    deterministic render) must match torch Adam driven by the re-executed
    reference assembly on the same 3 batches.  The torch side mirrors this
    repo's documented single-render-per-batch semantics (G and D update from
    one render; the reference renders everything twice per batch under PL's
    dual-optimizer loop — same per-step update math, half the FLOPs)."""
    import dataclasses

    import torch

    from sinnerf_tpu.models.discriminator import import_torch_discriminator_state
    from sinnerf_tpu.train.step import train_step

    disc_ref = import_reference_module("models.discriminator")

    trainer = _deterministic_trainer(scene, str(tmp_path), dis_weight=0.01)
    cfg = dataclasses.replace(trainer.cfg, policy="")
    hp = trainer.hparams

    torch.manual_seed(1)
    d_model = disc_ref.Discriminator(
        conditional=False, policy=None, ndf=64, imsize=hp.patch_size
    )
    d_model.train()
    d_params, sn = import_torch_discriminator_state(
        {k: v.detach().numpy() for k, v in d_model.state_dict().items()}
    )

    n_steps = 3
    batches = [
        trainer.train_dataset.sample(jax.random.key(100 + i), step=i, batch_size=1)
        for i in range(n_steps)
    ]

    # ---- ours: 3 composed train_steps (both optimizers) --------------------
    # numpy baselines + torch models BEFORE stepping: train_step donates its
    # state (donate_argnums=0), so the original param/d_param buffers may be
    # deleted after step 1
    state = trainer.state._replace(d_params=d_params, sn_state=sn)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    d0 = jax.tree_util.tree_map(np.asarray, d_params)
    models = _torch_models(trainer.state.params)
    our_losses = []
    for i, b in enumerate(batches):
        state, out = train_step(
            state, b, jax.random.key(200 + i), jnp.asarray(0.0),
            cfg, trainer.opt_g, trainer.opt_d,
        )
        our_losses.append(float(out["metrics"]["train/loss"]))

    # ---- torch: same batches through the reference assembly + Adam ---------
    g_opt = torch.optim.Adam(
        list(models[0].parameters()) + list(models[1].parameters()),
        lr=hp.lr, eps=1e-8,
    )
    d_opt = torch.optim.Adam(d_model.parameters(), lr=hp.lr * 0.2, eps=1e-8)
    want_losses = []
    for b in batches:
        batch_np = {k: np.asarray(v) for k, v in b.items()}
        res = _reference_assembly_torch(
            models, batch_np, trainer.train_dataset.white_back, hp
        )
        fake = res["side_rgb_fine_img"]
        real = torch.from_numpy(batch_np["real_patch"])
        pred_fake_g = d_model(fake)        # optimizer_idx==0 (sinnerf.py:446)
        g_adv = -pred_fake_g.mean()
        g_total = res["total_fixed"] + hp.dis_weight * g_adv
        g_opt.zero_grad()
        d_model.zero_grad()
        g_total.backward()
        g_opt.step()
        pred_real = d_model(real)          # optimizer_idx==1 (sinnerf.py:464)
        pred_fake_d = d_model(fake.detach())
        loss_d_raw = (
            torch.relu(1.0 - pred_real).mean()
            + torch.relu(1.0 + pred_fake_d).mean()
        ) / 2
        loss_d = hp.dis_weight * loss_d_raw
        d_model.zero_grad()
        loss_d.backward()
        d_opt.step()
        # the composed total our metrics report includes BOTH gan terms
        want_losses.append(
            float(g_total.detach()) + hp.dis_weight * float(loss_d_raw.detach())
        )

    np.testing.assert_allclose(
        our_losses, want_losses, rtol=3e-3, atol=1e-4,
        err_msg="per-step composed loss trajectory",
    )

    # ---- params after 3 steps, leaf-wise ------------------------------------
    from sinnerf_tpu.models.nerf import import_torch_state

    for i, name in enumerate(("coarse", "fine")):
        want = import_torch_state(
            {k: v.detach().numpy() for k, v in models[i].state_dict().items()}
        )
        # compare the 3-step DELTA per leaf as relative L2.  Noise model: at
        # step 1 Adam's bias-corrected update is exactly lr*sign(g) per
        # component, so every component whose tiny gradient flips sign under
        # f32 reassociation contributes a full lr of delta difference — the
        # measured noise floor peaks at ~3.7% on the PE-adjacent early layers
        # (most flip-prone grads) and falls to <0.1% by the output layers.
        # Per-leaf 8e-2 + full-vector 2.5e-2 still catch systematic errors
        # (wrong eps/beta/lr, missing or mis-weighted loss term, broken SN
        # evolution all shift whole leaves by O(1)); the per-step loss
        # trajectory above is pinned at 3e-3.
        diffs, wants = [], []
        for (path, lo), lw, l0 in zip(
            jax.tree_util.tree_flatten_with_path(state.params[name])[0],
            jax.tree_util.tree_leaves(want),
            jax.tree_util.tree_leaves(p0[name]),
        ):
            d_ours = np.asarray(lo) - np.asarray(l0)
            d_want = np.asarray(lw) - np.asarray(l0)
            denom = np.linalg.norm(d_want)
            assert denom > 0, f"{name}{jax.tree_util.keystr(path)} never moved"
            rel = np.linalg.norm(d_ours - d_want) / denom
            assert rel < 8e-2, (
                f"trajectory delta diverges at {name}"
                f"{jax.tree_util.keystr(path)}: rel L2 {rel:.4f}"
            )
            diffs.append((d_ours - d_want).ravel())
            wants.append(d_want.ravel())
        full_rel = np.linalg.norm(np.concatenate(diffs)) / np.linalg.norm(
            np.concatenate(wants)
        )
        assert full_rel < 2.5e-2, (
            f"{name} full-vector trajectory delta rel L2 {full_rel:.4f}"
        )

    # D's chain has no render noise (detached fake, data real): it must
    # match the torch trajectory essentially exactly (measured rel ~1e-4)
    d_want, _ = import_torch_discriminator_state(
        {k: v.detach().numpy() for k, v in d_model.state_dict().items()}
    )
    for (path, lo), lw, l0 in zip(
        jax.tree_util.tree_flatten_with_path(state.d_params)[0],
        jax.tree_util.tree_leaves(d_want),
        jax.tree_util.tree_leaves(d0),
    ):
        d_ours = np.asarray(lo) - np.asarray(l0)
        d_want_leaf = np.asarray(lw) - np.asarray(l0)
        denom = np.linalg.norm(d_want_leaf)
        assert denom > 0, f"D{jax.tree_util.keystr(path)} never moved"
        rel = np.linalg.norm(d_ours - d_want_leaf) / denom
        assert rel < 5e-3, (
            f"D trajectory delta diverges at {jax.tree_util.keystr(path)}: "
            f"rel L2 {rel:.4f}"
        )


def test_stochastic_loss_moments_match_reference(scene, tmp_path):
    """Moment-level sanity for the STOCHASTIC path (perturb=1, noise_std=1):
    RNG streams can't match across frameworks, so the composed deterministic
    golden can't see a systematic stochastic-path bias (e.g. jitter applied
    to the wrong interval, noise at the wrong scale).  Render the same batch
    N times on each side with independent RNG and compare the total-loss
    mean (within combined standard errors) and spread (same order)."""
    import torch

    hp = _hparams(
        scene, str(tmp_path), perturb=1.0, noise_std=1.0,
        N_samples=8, N_importance=8, depth_weight=8.0, proj_weight=1.0,
        depth_smooth_weight=0.5, num_rays=64, patch_size=16,
    )
    trainer = SinNeRFTrainer(hp)
    batch = trainer.train_dataset.sample(jax.random.key(7), step=0, batch_size=1)
    batch_np = {k: np.asarray(v) for k, v in batch.items()}

    @jax.jit
    def total_of(key):
        return compute_losses(
            trainer.state.params, None, None, None, None, batch,
            key, jnp.asarray(0.0), trainer.cfg,
        )[0]

    n = 12
    ours = np.array([float(total_of(jax.random.key(1000 + i))) for i in range(n)])

    models = _torch_models(trainer.state.params)
    torch.manual_seed(0)
    want = []
    with torch.no_grad():
        for _ in range(n):
            res = _reference_assembly_torch(
                models, batch_np, trainer.train_dataset.white_back, hp,
                perturb=1, noise_std=1,
            )
            want.append(float(res["total_fixed"]))
    want = np.array(want)

    sem = np.sqrt(ours.var(ddof=1) / n + want.var(ddof=1) / n)
    diff = abs(ours.mean() - want.mean())
    assert diff < max(5 * sem, 2e-3 * abs(want.mean())), (
        f"stochastic loss means diverge: ours {ours.mean():.5f} "
        f"vs torch {want.mean():.5f} (5*SEM {5 * sem:.5f})"
    )
    # spreads within the same order of magnitude (loose by design: n=12)
    ratio = ours.std(ddof=1) / max(want.std(ddof=1), 1e-12)
    assert 0.2 < ratio < 5.0, (
        f"stochastic loss spread mismatch: std ratio {ratio:.3f} "
        f"(ours {ours.std(ddof=1):.5f}, torch {want.std(ddof=1):.5f})"
    )


def test_composed_gan_terms_match_reference(scene, tmp_path):
    """The adversarial branch of the composed step with IDENTICAL imported D
    weights: our single-render G/D assembly must reproduce the reference's
    dual-optimizer hinge terms (sinnerf.py:445-487) — G sees -mean(D(fake)),
    D sees hinge(real)/hinge(fake.detach()), with the spectral-norm power
    iteration advancing in the same call order (fake_g, real, fake_d).
    DiffAugment disabled deterministically on both sides."""
    import dataclasses

    import torch

    from sinnerf_tpu.models.discriminator import import_torch_discriminator_state

    disc_ref = import_reference_module("models.discriminator")

    trainer = _deterministic_trainer(scene, str(tmp_path), dis_weight=0.01)
    cfg = dataclasses.replace(trainer.cfg, policy="")
    batch = trainer.train_dataset.sample(jax.random.key(21), step=0, batch_size=1)
    psx, psy = np.asarray(batch["real_patch"]).shape[-2:]

    torch.manual_seed(1)
    d_model = disc_ref.Discriminator(
        conditional=False, policy=None, ndf=64, imsize=trainer.hparams.patch_size
    )
    d_model.train()
    d_params, sn = import_torch_discriminator_state(
        {k: v.detach().numpy() for k, v in d_model.state_dict().items()}
    )

    total, aux = compute_losses(
        trainer.state.params,
        d_params,
        sn,
        None,
        None,
        batch,
        jax.random.key(22),
        jnp.asarray(0.0),
        cfg,
    )
    ours_g_adv = float(aux["metrics"]["train/loss_g_adv"])
    ours_d = float(aux["metrics"]["train/loss_d"])

    # reference side: torch-render the side view, then the two training_step
    # passes (optimizer_idx 0 then 1), each D call advancing the SN state
    models = _torch_models(trainer.state.params)
    with torch.no_grad():
        side = _ref_forward(
            models, np.asarray(batch["rays_full"]).reshape(-1, 8),
            trainer.train_dataset.white_back,
            trainer.hparams.N_samples, trainer.hparams.N_importance,
        )
        fake = side["rgb_fine"].reshape(1, psx, psy, 3).permute(0, 3, 1, 2)
        real = torch.from_numpy(np.asarray(batch["real_patch"]))
        pred_fake_g = d_model(fake)            # optimizer_idx==0 (sinnerf.py:446)
        want_g_adv = float(-torch.mean(pred_fake_g))
        pred_real = d_model(real)              # optimizer_idx==1 (sinnerf.py:464)
        pred_fake_d = d_model(fake)            # .detach() irrelevant in no_grad
        loss_dreal = torch.relu(1.0 - pred_real).mean()
        loss_dgen = torch.relu(1.0 + pred_fake_d).mean()
        want_d = float((loss_dreal + loss_dgen) / 2)

    np.testing.assert_allclose(ours_g_adv, want_g_adv, rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(ours_d, want_d, rtol=5e-3, atol=1e-3)
