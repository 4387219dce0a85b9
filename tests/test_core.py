"""Golden tests for sinnerf_tpu.core against the PyTorch reference semantics
(analytic cases + direct comparison with /root/reference modules)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sinnerf_tpu.core import (
    composite,
    compute_weights,
    get_ray_directions,
    get_rays,
    make_ray_bundle,
    positional_encoding,
    sample_pdf,
    searchsorted_right,
    shifted_softplus,
    stratified_z_vals,
    widened_sigmoid,
)
from tests.reference_util import import_reference_module


# ---------------------------------------------------------------- activations
def test_widened_sigmoid_matches_formula():
    x = np.linspace(-10, 10, 101, dtype=np.float32)
    got = np.asarray(widened_sigmoid(jnp.asarray(x)))
    want = 0.5 * (1.0 + (1.0 + 2e-3) * np.tanh(0.5 * x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # ranges slightly beyond [0, 1]
    assert got.min() < 0.0 and got.max() > 1.0


def test_shifted_softplus_is_softplus_shifted():
    x = np.linspace(-20, 20, 201, dtype=np.float32)
    got = np.asarray(shifted_softplus(jnp.asarray(x)))
    want = np.logaddexp(0.0, x - 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_activations_match_reference_torch():
    ref = import_reference_module("models.activations")
    import torch

    x = np.random.default_rng(1).normal(size=(64,)).astype(np.float32) * 5
    tx = torch.from_numpy(x)
    np.testing.assert_allclose(
        np.asarray(widened_sigmoid(jnp.asarray(x))),
        ref.widened_sigmoid(tx).numpy(),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(shifted_softplus(jnp.asarray(x))),
        ref.shifted_softplus(tx).numpy(),
        rtol=1e-5,
        atol=1e-6,
    )


# ------------------------------------------------------------------- encoding
def test_positional_encoding_layout():
    """Order must be [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), ...] per channel
    block (models/nerf.py:36-41)."""
    x = np.array([[0.1, -0.2, 0.3]], dtype=np.float32)
    got = np.asarray(positional_encoding(jnp.asarray(x), n_freqs=4))
    assert got.shape == (1, 3 * (2 * 4 + 1))
    chunks = [x[0]]
    for k in range(4):
        chunks.append(np.sin(2.0**k * x[0]))
        chunks.append(np.cos(2.0**k * x[0]))
    np.testing.assert_allclose(got[0], np.concatenate(chunks), rtol=1e-6)


def test_positional_encoding_matches_reference():
    nerf_ref = import_reference_module("models.nerf")
    import torch

    x = np.random.default_rng(2).normal(size=(17, 3)).astype(np.float32)
    emb = nerf_ref.Embedding(3, 10)
    want = emb(torch.from_numpy(x)).numpy()
    got = np.asarray(positional_encoding(jnp.asarray(x), n_freqs=10))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------- sampling
def test_stratified_linear_and_disp():
    near = jnp.full((5, 1), 2.0)
    far = jnp.full((5, 1), 6.0)
    z = np.asarray(stratified_z_vals(near, far, 9))
    np.testing.assert_allclose(z[0], np.linspace(2.0, 6.0, 9), rtol=1e-6)
    zd = np.asarray(stratified_z_vals(near, far, 9, use_disp=True))
    want = 1.0 / np.linspace(1 / 2.0, 1 / 6.0, 9)
    np.testing.assert_allclose(zd[0], want, rtol=1e-6)


def test_stratified_perturb_stays_in_strata():
    near = jnp.full((128, 1), 2.0)
    far = jnp.full((128, 1), 6.0)
    z0 = np.asarray(stratified_z_vals(near, far, 16))
    z = np.asarray(
        stratified_z_vals(near, far, 16, perturb=1.0, key=jax.random.key(0))
    )
    assert (np.diff(z, axis=-1) > 0).all()  # still sorted
    assert (z >= z0[:, :1]).all() and (z <= z0[:, -1:]).all()
    assert not np.allclose(z, z0)


def test_searchsorted_right_matches_numpy():
    rng = np.random.default_rng(3)
    seq = np.sort(rng.uniform(size=(7, 33)), axis=-1).astype(np.float32)
    vals = rng.uniform(size=(7, 12)).astype(np.float32)
    got = np.asarray(searchsorted_right(jnp.asarray(seq), jnp.asarray(vals)))
    want = np.stack(
        [np.searchsorted(seq[i], vals[i], side="right") for i in range(7)]
    )
    np.testing.assert_array_equal(got, want)


def test_sample_pdf_det_matches_reference():
    rendering_ref = import_reference_module("models.rendering")
    import torch

    rng = np.random.default_rng(4)
    n_rays, n_samples = 32, 64
    z = np.sort(rng.uniform(2, 6, size=(n_rays, n_samples)), -1).astype(np.float32)
    bins = 0.5 * (z[:, :-1] + z[:, 1:])
    w = rng.uniform(0, 1, size=(n_rays, n_samples - 2)).astype(np.float32)

    want = rendering_ref.sample_pdf(
        torch.from_numpy(bins), torch.from_numpy(w), 64, det=True
    ).numpy()
    got = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(w), 64, det=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sample_pdf_concentrates_on_heavy_bins():
    # all weight in the middle bin -> samples must land there
    bins = jnp.linspace(0.0, 1.0, 11)[None, :].repeat(4, axis=0)
    w = jnp.zeros((4, 10)).at[:, 5].set(1.0)
    s = np.asarray(sample_pdf(bins, w, 100, det=False, key=jax.random.key(1)))
    frac_in_bin = ((s >= 0.5) & (s <= 0.6)).mean()
    assert frac_in_bin > 0.95


# ------------------------------------------------------------------ composite
def test_composite_opaque_surface():
    """A single huge-sigma sample should composite to that sample's color and
    depth with weight ~1."""
    n, s = 4, 16
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, s), (n, s))
    sigmas = jnp.zeros((n, s)).at[:, 7].set(1e4)
    rgbs = jnp.zeros((n, s, 3)).at[:, 7, 0].set(0.7)
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    out = composite(rgbs, sigmas, z, rays_d)
    np.testing.assert_allclose(out.weights[:, 7], 1.0, atol=1e-4)
    np.testing.assert_allclose(out.rgb[:, 0], 0.7, atol=1e-4)
    np.testing.assert_allclose(out.depth, float(z[0, 7]), atol=1e-3)


def test_composite_empty_space_white_back():
    n, s = 3, 8
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, s), (n, s))
    sigmas = jnp.full((n, s), -50.0)  # relu -> 0 density
    rgbs = jnp.zeros((n, s, 3))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    out = composite(rgbs, sigmas, z, rays_d, white_back=True)
    np.testing.assert_allclose(out.rgb, 1.0, atol=1e-5)
    out_black = composite(rgbs, sigmas, z, rays_d, white_back=False)
    np.testing.assert_allclose(out_black.rgb, 0.0, atol=1e-5)


def test_compute_weights_direction_norm_scaling():
    """Doubling ||d|| doubles the effective deltas (rendering.py:222)."""
    n, s = 2, 32
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, s), (n, s))
    sigmas = jnp.full((n, s), 0.5)
    d1 = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    w1 = compute_weights(sigmas, z, d1)
    w2 = compute_weights(sigmas, z, 2.0 * d1)
    # opacity accumulates faster with longer deltas
    assert float(w2[:, :4].sum()) > float(w1[:, :4].sum())


# ----------------------------------------------------------------------- rays
def test_ray_directions_match_reference():
    ray_utils_ref = import_reference_module("datasets.ray_utils")
    h, w, focal = 12, 15, 20.0
    want = ray_utils_ref.get_ray_directions(h, w, focal).numpy()
    got = np.asarray(get_ray_directions(h, w, focal))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_get_rays_match_reference():
    ray_utils_ref = import_reference_module("datasets.ray_utils")
    import torch

    rng = np.random.default_rng(5)
    h, w, focal = 8, 10, 15.0
    c2w = np.eye(3, 4, dtype=np.float32)
    c2w[:, 3] = rng.normal(size=3)
    dirs_t = ray_utils_ref.get_ray_directions(h, w, focal)
    o_t, d_t = ray_utils_ref.get_rays(dirs_t, torch.from_numpy(c2w))
    o, d = get_rays(get_ray_directions(h, w, focal), jnp.asarray(c2w))
    np.testing.assert_allclose(np.asarray(o), o_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), d_t.numpy(), rtol=1e-5, atol=1e-6)


def test_get_ndc_rays_match_reference():
    """Golden vs ``datasets/ray_utils.py:123-164`` on random camera-frame
    rays (dead in the reference — ndc=False everywhere — but exported here,
    so it must be pinned)."""
    ray_utils_ref = import_reference_module("datasets.ray_utils")
    import torch

    from sinnerf_tpu.core.rays import get_ndc_rays

    rng = np.random.default_rng(7)
    h, w, focal, near = 12, 16, 20.0, 1.0
    rays_o = rng.normal(size=(40, 3)).astype(np.float32)
    rays_d = rng.normal(size=(40, 3)).astype(np.float32)
    # keep rays looking forward (-z) so the near-plane shift is well-posed
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.1
    rays_o[:, 2] = -np.abs(rays_o[:, 2]) - 2.0
    o_t, d_t = ray_utils_ref.get_ndc_rays(
        h, w, focal, near, torch.from_numpy(rays_o), torch.from_numpy(rays_d)
    )
    o, d = get_ndc_rays(
        h, w, focal, near, jnp.asarray(rays_o), jnp.asarray(rays_d)
    )
    np.testing.assert_allclose(np.asarray(o), o_t.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), d_t.numpy(), rtol=1e-5, atol=1e-5)


def test_ray_bundle_layout():
    dirs = get_ray_directions(4, 4, 5.0)
    bundle = np.asarray(make_ray_bundle(dirs, jnp.eye(3, 4), 2.0, 6.0))
    assert bundle.shape == (16, 8)
    np.testing.assert_allclose(bundle[:, 6], 2.0)
    np.testing.assert_allclose(bundle[:, 7], 6.0)


def test_sample_pdf_sorted_u_is_sorted_and_valid():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 63), (16, 63))
    w = jnp.asarray(np.random.default_rng(11).uniform(size=(16, 62)).astype(np.float32))
    s = np.asarray(
        sample_pdf(bins, w, 64, det=False, key=jax.random.key(2), sorted_u=True)
    )
    assert (np.diff(s, axis=-1) >= 0).all()
    assert s.min() >= 0.0 and s.max() <= 1.0


def test_blocked_t_recurrence_matches_exact():
    """The double-angle sin/cos ladder must match direct evaluation."""
    from sinnerf_tpu.core.encoding import (
        positional_encoding_blocked_t,
        freq_bands,
    )

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.uniform(-4, 4, size=(3, 1000)).astype(np.float32))
    got = np.asarray(positional_encoding_blocked_t(x, 10))
    bands = np.asarray(freq_bands(10))
    xb = (bands[:, None, None] * np.asarray(x)[None]).reshape(30, -1)
    want = np.concatenate([np.asarray(x), np.sin(xb), np.cos(xb)], axis=0)
    np.testing.assert_allclose(got, want, atol=3e-5)
