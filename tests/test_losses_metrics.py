"""Tests for losses and metrics (torch golden values where cheap, analytic
cases otherwise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sinnerf_tpu.losses import (
    d_loss,
    g_loss,
    gan_bce_loss,
    gan_ls_loss,
    inverse_depth_smoothness_loss,
    l2_ssim_loss,
    loss_dict,
    mse_loss,
    smooth_l1,
    smooth_l1_masked,
)
from sinnerf_tpu.utils.metrics import dssim_loss, psnr, ssim, ssim_map


def test_mse_loss_dict_schema():
    rng = np.random.default_rng(0)
    res = {
        "rgb_coarse": jnp.asarray(rng.uniform(size=(32, 3)).astype(np.float32)),
        "rgb_fine": jnp.asarray(rng.uniform(size=(32, 3)).astype(np.float32)),
    }
    tgt = jnp.asarray(rng.uniform(size=(32, 3)).astype(np.float32))
    out = mse_loss(res, tgt)
    want = np.mean((np.asarray(res["rgb_coarse"]) - np.asarray(tgt)) ** 2) + np.mean(
        (np.asarray(res["rgb_fine"]) - np.asarray(tgt)) ** 2
    )
    np.testing.assert_allclose(float(out["tot"]), want, rtol=1e-6)
    assert set(out) == {"tot", "l2"}
    assert set(loss_dict) == {"mse", "l2_ssim", "l2_vgg"}


def test_smooth_l1_matches_torch():
    import torch

    rng = np.random.default_rng(1)
    a = rng.normal(size=(100,)).astype(np.float32) * 3
    b = rng.normal(size=(100,)).astype(np.float32)
    got = float(jnp.mean(smooth_l1(jnp.asarray(a), jnp.asarray(b))))
    want = float(
        torch.nn.SmoothL1Loss(reduction="mean")(torch.from_numpy(a), torch.from_numpy(b))
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_smooth_l1_masked_semantics():
    import torch

    rng = np.random.default_rng(2)
    pred = rng.normal(size=(50,)).astype(np.float32)
    tgt = rng.normal(size=(50,)).astype(np.float32)
    tgt[::3] = 0.0  # masked out by default target>0 mask... but sign matters
    tgt = np.abs(tgt)
    tgt[::3] = 0.0
    # torch reference semantics: loss over pred[mask], target[mask]
    mask = tgt > 0
    want = float(
        torch.nn.SmoothL1Loss()(
            torch.from_numpy(pred[mask]), torch.from_numpy(tgt[mask])
        )
    )
    got = float(smooth_l1_masked(jnp.asarray(pred), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # empty mask -> 0, not NaN
    zero = float(
        smooth_l1_masked(jnp.asarray(pred), jnp.zeros_like(jnp.asarray(tgt)))
    )
    assert zero == 0.0


def test_smooth_l1_masked_no_mask():
    rng = np.random.default_rng(3)
    pred = jnp.asarray(rng.normal(size=(20,)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(20,)).astype(np.float32))
    got = float(smooth_l1_masked(pred, tgt, use_mask=False))
    want = float(jnp.mean(smooth_l1(pred, tgt)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_ssim_identical_images_is_one():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(size=(1, 3, 32, 32)).astype(np.float32))
    assert float(ssim(img, img)) > 0.9999
    assert float(dssim_loss(img, img)) < 1e-5


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(size=(1, 3, 32, 32)).astype(np.float32))
    noisy = img + 0.2 * jnp.asarray(rng.normal(size=img.shape).astype(np.float32))
    s_clean = float(ssim(img, img))
    s_noisy = float(ssim(img, noisy))
    assert s_noisy < s_clean
    assert float(dssim_loss(img, noisy)) > 0.01


def test_psnr_known_value():
    a = jnp.zeros((10, 3))
    b = jnp.full((10, 3), 0.1)
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, rtol=1e-5)


def test_inverse_depth_smoothness_flat_depth_zero():
    depth = jnp.ones((1, 1, 16, 16))
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.uniform(size=(1, 3, 16, 16)).astype(np.float32))
    assert float(inverse_depth_smoothness_loss(depth, img)) < 1e-7


def test_inverse_depth_smoothness_edge_weighting():
    """Depth discontinuity aligned with an image edge costs less than one in a
    flat image region."""
    depth = jnp.concatenate(
        [jnp.ones((1, 1, 16, 8)), 2 * jnp.ones((1, 1, 16, 8))], axis=-1
    )
    flat_img = jnp.full((1, 3, 16, 16), 0.5)
    edge_img = jnp.concatenate(
        [jnp.zeros((1, 3, 16, 8)), jnp.ones((1, 3, 16, 8))], axis=-1
    )
    l_flat = float(inverse_depth_smoothness_loss(depth, flat_img))
    l_edge = float(inverse_depth_smoothness_loss(depth, edge_img))
    assert l_edge < l_flat


def test_gan_hinge_losses():
    fake = jnp.asarray([-0.5, 0.5])
    real = jnp.asarray([0.8, 1.5])
    np.testing.assert_allclose(float(g_loss(fake, "hinge")), 0.0, atol=1e-7)
    # d hinge: relu(1-real)=[0.2,0] mean .1 ; relu(1+fake)=[0.5,1.5] mean 1.0
    np.testing.assert_allclose(float(d_loss(real, fake, "hinge")), (0.1 + 1.0) / 2, rtol=1e-6)


def test_gan_vanilla_and_wgan():
    fake = jnp.asarray([0.3, 0.7])
    real = jnp.asarray([0.9, 0.2])
    np.testing.assert_allclose(
        float(g_loss(fake, "vanilla")), float(gan_ls_loss(fake, True)), rtol=1e-6
    )
    np.testing.assert_allclose(float(g_loss(fake, "wgan")), float(jnp.mean(fake)), rtol=1e-6)
    # reference compute_loss semantics (sinnerf.py:241-256, 480-482):
    # d = (2*0-1)*mean(fake) + (2*1-1)*mean(real) = mean(real) - mean(fake)
    np.testing.assert_allclose(
        float(d_loss(real, fake, "wgan")),
        float(jnp.mean(real)) - float(jnp.mean(fake)),
        rtol=1e-5,
    )


def test_gan_bce_matches_torch():
    import torch

    logits = np.array([-2.0, 0.5, 3.0], dtype=np.float32)
    want = float(
        torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.ones(3)
        )
    )
    got = float(gan_bce_loss(jnp.asarray(logits), True))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_l2_ssim_loss_combination():
    rng = np.random.default_rng(7)
    img = rng.uniform(size=(1, 3, 16, 16)).astype(np.float32)
    res = {"rgb_coarse": jnp.asarray(img), "rgb_fine": jnp.asarray(img)}
    out = l2_ssim_loss(res, jnp.asarray(img))
    np.testing.assert_allclose(float(out["tot"]), 0.0, atol=1e-5)
    assert "ssim" in out and "l2" in out


def test_time_fn_harness():
    """profiling.time_fn returns a sane positive per-iteration time."""
    from sinnerf_tpu.utils.profiling import time_fn

    x = jnp.ones((256, 256))
    dt = time_fn(lambda a: a @ a, x, iters=5, repeats=2)
    assert 0 < dt < 1.0


def test_visualize_depth_shape():
    from sinnerf_tpu.utils.visualization import visualize_depth

    out = visualize_depth(np.random.default_rng(0).uniform(size=(8, 10)))
    assert out.shape == (3, 8, 10)
    assert out.min() >= 0 and out.max() <= 1
