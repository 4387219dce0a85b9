"""Parity tests: NeRF MLP forward and full render_rays vs the PyTorch
reference with identical weights (deterministic settings)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sinnerf_tpu.core.encoding import positional_encoding
from sinnerf_tpu.models.nerf import (
    export_torch_state,
    import_torch_state,
    init_nerf_params,
    nerf_apply,
)
from sinnerf_tpu.render.renderer import (
    RenderSettings,
    render_chunked,
    render_rays,
)
from tests.reference_util import import_reference_module


def _make_params(seed=0):
    return init_nerf_params(jax.random.key(seed))


def _torch_nerf_with_params(params):
    """Build the reference torch NeRF and load our params into it."""
    nerf_ref = import_reference_module("models.nerf")
    import torch

    model = nerf_ref.NeRF(use_new_activation=True)
    state = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_torch_state(params).items()
    }
    missing, unexpected = model.load_state_dict(state, strict=True), None
    model.eval()
    return model


def test_mlp_forward_matches_reference():
    import torch

    params = _make_params()
    model = _torch_nerf_with_params(params)

    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1, 1, size=(256, 3)).astype(np.float32)
    dirs = rng.normal(size=(256, 3)).astype(np.float32)

    xyz_pe = positional_encoding(jnp.asarray(xyz), 10)
    dir_pe = positional_encoding(jnp.asarray(dirs), 4)
    got = np.asarray(nerf_apply(params, xyz_pe, dir_pe))

    with torch.no_grad():
        x_in = torch.cat(
            [torch.from_numpy(np.asarray(xyz_pe)), torch.from_numpy(np.asarray(dir_pe))],
            dim=-1,
        )
        want = model(x_in).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mlp_sigma_only_matches_reference():
    import torch

    params = _make_params(1)
    model = _torch_nerf_with_params(params)
    rng = np.random.default_rng(1)
    xyz = rng.uniform(-2, 2, size=(128, 3)).astype(np.float32)
    xyz_pe = positional_encoding(jnp.asarray(xyz), 10)
    got = np.asarray(nerf_apply(params, xyz_pe, sigma_only=True))
    with torch.no_grad():
        want = model(torch.from_numpy(np.asarray(xyz_pe)), sigma_only=True).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_torch_import_roundtrip():
    params = _make_params(2)
    state = export_torch_state(params, model_prefix="nerf_coarse.")
    back = import_torch_state(state, model_prefix="nerf_coarse.")
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]["w"]), np.asarray(back[k]["w"]))
        np.testing.assert_array_equal(np.asarray(params[k]["b"]), np.asarray(back[k]["b"]))


def _reference_render(params_c, params_f, rays, n_samples, n_importance,
                      white_back, use_disp=False):
    """Run the reference render_rays deterministically on torch."""
    rendering_ref = import_reference_module("models.rendering")
    nerf_ref = import_reference_module("models.nerf")
    import torch

    models = []
    for p in (params_c, params_f):
        m = _torch_nerf_with_params(p)
        models.append(m)
    embeddings = [nerf_ref.Embedding(3, 10), nerf_ref.Embedding(3, 4)]
    with torch.no_grad():
        out = rendering_ref.render_rays(
            models,
            embeddings,
            torch.from_numpy(rays),
            N_samples=n_samples,
            use_disp=use_disp,
            perturb=0,
            noise_std=0,
            N_importance=n_importance,
            chunk=4096,
            white_back=white_back,
            test_time=False,
        )
    return {k: v.numpy() for k, v in out.items()}


@pytest.mark.parametrize("white_back", [False, True])
def test_render_rays_matches_reference(white_back):
    params = {"coarse": _make_params(3), "fine": _make_params(4)}

    rng = np.random.default_rng(3)
    n = 64
    rays_o = rng.normal(size=(n, 3)).astype(np.float32)
    rays_d = rng.normal(size=(n, 3)).astype(np.float32)
    near = np.full((n, 1), 2.0, np.float32)
    far = np.full((n, 1), 6.0, np.float32)
    rays = np.concatenate([rays_o, rays_d, near, far], axis=1)

    settings = RenderSettings(
        n_samples=16, n_importance=16, perturb=0.0, noise_std=0.0,
        white_back=white_back,
    )
    got = render_rays(params, jnp.asarray(rays), None, settings)
    want = _reference_render(
        params["coarse"], params["fine"], rays, 16, 16, white_back
    )

    for k in ["rgb_coarse", "depth_coarse", "rgb_fine", "depth_fine"]:
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k], rtol=1e-3, atol=2e-4, err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(got["opacity_coarse"]), want["opacity_coarse"], atol=2e-4
    )


def test_render_chunked_matches_unchunked():
    params = {"coarse": _make_params(5), "fine": _make_params(6)}
    rng = np.random.default_rng(5)
    n = 100  # deliberately not a multiple of the tile
    rays = np.concatenate(
        [
            rng.normal(size=(n, 3)).astype(np.float32),
            rng.normal(size=(n, 3)).astype(np.float32),
            np.full((n, 1), 2.0, np.float32),
            np.full((n, 1), 6.0, np.float32),
        ],
        axis=1,
    )
    settings = RenderSettings(n_samples=8, n_importance=8, perturb=0.0, noise_std=0.0)
    whole = render_rays(params, jnp.asarray(rays), None, settings)
    tiled = render_chunked(params, jnp.asarray(rays), settings, tile=32)
    for k in whole:
        np.testing.assert_allclose(
            np.asarray(tiled[k]), np.asarray(whole[k]), rtol=1e-4, atol=1e-5, err_msg=k
        )


def test_render_grad_does_not_flow_through_pdf():
    """stop_gradient placement (rendering.py:311-313): fine loss must still
    produce coarse-model grads (through the coarse rgb loss only)."""
    params = {"coarse": _make_params(7), "fine": _make_params(8)}
    # A fresh init can emit all-negative sigmas (relu -> zero density -> zero
    # grads); bias the density heads positive so the scene is non-degenerate.
    for m in params.values():
        m["sigma"]["b"] = m["sigma"]["b"] + 2.0
    rays = jnp.concatenate(
        [
            jnp.zeros((4, 3)),
            jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1)),
            jnp.full((4, 1), 2.0),
            jnp.full((4, 1), 6.0),
        ],
        axis=1,
    )
    settings = RenderSettings(n_samples=8, n_importance=8, perturb=0.0, noise_std=0.0)

    def fine_loss(p):
        out = render_rays(p, rays, None, settings)
        return jnp.mean(out["rgb_fine"] ** 2)

    grads = jax.grad(fine_loss)(params)
    # fine grads nonzero
    g_fine = sum(float(jnp.abs(v["w"]).sum()) for v in grads["fine"].values())
    assert g_fine > 0
    # coarse grads must be zero: rgb_fine depends on coarse only through the
    # detached z samples
    g_coarse = sum(float(jnp.abs(v["w"]).sum()) for v in grads["coarse"].values())
    assert g_coarse == 0.0


def test_render_stochastic_runs_and_differs():
    params = {"coarse": _make_params(9), "fine": _make_params(10)}
    rng = np.random.default_rng(9)
    rays = np.concatenate(
        [
            rng.normal(size=(8, 3)).astype(np.float32),
            rng.normal(size=(8, 3)).astype(np.float32),
            np.full((8, 1), 2.0, np.float32),
            np.full((8, 1), 6.0, np.float32),
        ],
        axis=1,
    )
    settings = RenderSettings(n_samples=8, n_importance=8, perturb=1.0, noise_std=1.0)
    a = render_rays(params, jnp.asarray(rays), jax.random.key(0), settings)
    b = render_rays(params, jnp.asarray(rays), jax.random.key(1), settings)
    assert not np.allclose(np.asarray(a["rgb_fine"]), np.asarray(b["rgb_fine"]))
    # same key -> identical (fully deterministic given the key)
    a2 = render_rays(params, jnp.asarray(rays), jax.random.key(0), settings)
    np.testing.assert_array_equal(np.asarray(a["rgb_fine"]), np.asarray(a2["rgb_fine"]))


def test_bfloat16_compute_close_to_f32():
    params = {"coarse": _make_params(11), "fine": _make_params(12)}
    rng = np.random.default_rng(11)
    rays = np.concatenate(
        [
            rng.normal(size=(32, 3)).astype(np.float32),
            rng.normal(size=(32, 3)).astype(np.float32),
            np.full((32, 1), 2.0, np.float32),
            np.full((32, 1), 6.0, np.float32),
        ],
        axis=1,
    )
    s32 = RenderSettings(n_samples=16, n_importance=16, perturb=0.0, noise_std=0.0)
    sbf = dataclasses.replace(s32, compute_dtype="bfloat16")
    a = render_rays(params, jnp.asarray(rays), None, s32)
    b = render_rays(params, jnp.asarray(rays), None, sbf)
    assert np.abs(np.asarray(a["rgb_fine"]) - np.asarray(b["rgb_fine"])).mean() < 0.03


def test_fast_merge_equals_exact_sort_deterministic():
    """With det sampling the fast-merge path must produce identical images to
    the exact reference path (same z values, only the merge differs)."""
    params = {"coarse": _make_params(20), "fine": _make_params(21)}
    rng = np.random.default_rng(20)
    rays = np.concatenate(
        [
            rng.normal(size=(32, 3)).astype(np.float32),
            rng.normal(size=(32, 3)).astype(np.float32),
            np.full((32, 1), 2.0, np.float32),
            np.full((32, 1), 6.0, np.float32),
        ],
        axis=1,
    )
    s_fast = RenderSettings(n_samples=16, n_importance=16, perturb=0.0, noise_std=0.0)
    s_exact = dataclasses.replace(s_fast, fast_merge=False)
    a = render_rays(params, jnp.asarray(rays), None, s_fast)
    b = render_rays(params, jnp.asarray(rays), None, s_exact)
    for k in ("rgb_fine", "depth_fine"):
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_points_chunking_matches_unchunked():
    """Tiny points_chunk forces the lax.map streaming path; results must be
    identical to the single-call path."""
    params = {"coarse": _make_params(30), "fine": _make_params(31)}
    for m in params.values():  # avoid the zero-density degenerate init
        m["sigma"]["b"] = m["sigma"]["b"] + 2.0
    rng = np.random.default_rng(30)
    rays = np.concatenate(
        [
            rng.normal(size=(64, 3)).astype(np.float32),
            rng.normal(size=(64, 3)).astype(np.float32),
            np.full((64, 1), 2.0, np.float32),
            np.full((64, 1), 6.0, np.float32),
        ],
        axis=1,
    )
    big = RenderSettings(n_samples=8, n_importance=8, perturb=0.0, noise_std=0.0)
    small = dataclasses.replace(big, points_chunk=128)  # 64*8=512 pts -> 4 chunks
    a = render_rays(params, jnp.asarray(rays), None, big)
    b = render_rays(params, jnp.asarray(rays), None, small)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )
    # grads flow through the chunked+remat path
    def loss(p):
        return jnp.mean(
            render_rays(p, jnp.asarray(rays), None, small)["rgb_fine"] ** 2
        )
    g = jax.grad(loss)(params)
    assert sum(float(jnp.abs(v["w"]).sum()) for v in g["fine"].values()) > 0


def test_render_chunked_sharded_matches_single_device():
    """Mesh-sharded image rendering (ray axis over 8 virtual CPU devices)
    must equal the single-device render exactly; ray count deliberately not a
    multiple of tile*devices."""
    from sinnerf_tpu.parallel.mesh import make_mesh, replicate
    from sinnerf_tpu.render.renderer import render_chunked_sharded

    params = {"coarse": _make_params(50), "fine": _make_params(51)}
    rng = np.random.default_rng(50)
    n = 1000
    rays = np.concatenate(
        [
            rng.normal(size=(n, 3)).astype(np.float32),
            rng.normal(size=(n, 3)).astype(np.float32),
            np.full((n, 1), 2.0, np.float32),
            np.full((n, 1), 6.0, np.float32),
        ],
        axis=1,
    )
    settings = RenderSettings(n_samples=8, n_importance=8, perturb=0.0, noise_std=0.0)
    single = render_chunked(params, jnp.asarray(rays), settings, tile=256)
    mesh = make_mesh(8)
    sharded = render_chunked_sharded(
        replicate(params, mesh), jnp.asarray(rays), settings, mesh, tile=256
    )
    for k in single:
        # atol 1e-5: XLA fuses differently inside shard_map (associativity)
        np.testing.assert_allclose(
            np.asarray(sharded[k]), np.asarray(single[k]),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )


def test_pick_val_tile_static():
    from sinnerf_tpu.render.renderer import pick_val_tile

    # whole image fits: tile rounds the per-device share up to 256
    assert pick_val_tile(4096, 32768, 1) == 4096
    assert pick_val_tile(4096, 32768, 8) == 512
    # chunk caps the tile
    assert pick_val_tile(504 * 378, 32768, 1) == 32768
    # never below 256, rounding holds for odd sizes
    assert pick_val_tile(100, 32768, 8) == 256
    assert pick_val_tile(190512, 32768, 8) % 256 == 0


def test_eval_points_matches_sigma_query():
    """eval_points (point-cloud sigma tool, rendering.py:64-123) equals a
    direct sigma-only MLP query on the fine model."""
    from sinnerf_tpu.render.renderer import eval_points

    params = {"coarse": _make_params(40), "fine": _make_params(41)}
    rng = np.random.default_rng(40)
    pts = jnp.asarray(rng.uniform(-1, 1, size=(100, 3)).astype(np.float32))
    got = eval_points(params, pts)
    want = nerf_apply(
        params["fine"], positional_encoding(pts, 10), sigma_only=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
    assert got.shape == (100, 1)


def test_detach_coarse_blocks_coarse_grads():
    """detach_coarse (rendering.py:294-298): no grads reach the coarse model."""
    params = {"coarse": _make_params(42), "fine": _make_params(43)}
    for m in params.values():
        m["sigma"]["b"] = m["sigma"]["b"] + 2.0
    rays = jnp.concatenate(
        [
            jnp.zeros((4, 3)),
            jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1)),
            jnp.full((4, 1), 2.0),
            jnp.full((4, 1), 6.0),
        ],
        axis=1,
    )
    s = RenderSettings(
        n_samples=8, n_importance=8, perturb=0.0, noise_std=0.0,
        detach_coarse=True,
    )

    def loss(p):
        out = render_rays(p, rays, None, s)
        return jnp.mean(out["rgb_coarse"] ** 2) + jnp.mean(out["rgb_fine"] ** 2)

    g = jax.grad(loss)(params)
    assert sum(float(jnp.abs(v["w"]).sum()) for v in g["coarse"].values()) == 0.0
    assert sum(float(jnp.abs(v["w"]).sum()) for v in g["fine"].values()) > 0


def test_test_time_renders_opacity_and_fine_only():
    """test_time (rendering.py:287-292): coarse pass is sigma-only."""
    params = {"coarse": _make_params(44), "fine": _make_params(45)}
    rng = np.random.default_rng(44)
    rays = np.concatenate(
        [
            rng.normal(size=(8, 3)).astype(np.float32),
            rng.normal(size=(8, 3)).astype(np.float32),
            np.full((8, 1), 2.0, np.float32),
            np.full((8, 1), 6.0, np.float32),
        ],
        axis=1,
    )
    s = RenderSettings(n_samples=8, n_importance=8, perturb=0.0, noise_std=0.0,
                       test_time=True)
    out = render_rays(params, jnp.asarray(rays), None, s)
    assert set(out) == {"opacity_coarse", "rgb_fine", "depth_fine", "opacity_fine"}
    assert out["opacity_coarse"].shape == (8, 8)
    assert np.isfinite(np.asarray(out["rgb_fine"])).all()


def test_render_rays_use_disp_matches_reference():
    """Disparity-space sampling (--use_disp; rendering.py:274-277 z in
    1/depth) golden vs the reference."""
    params = {"coarse": _make_params(7), "fine": _make_params(8)}
    rng = np.random.default_rng(7)
    n = 48
    rays = np.concatenate(
        [
            rng.normal(size=(n, 3)).astype(np.float32),
            rng.normal(size=(n, 3)).astype(np.float32),
            np.full((n, 1), 2.0, np.float32),
            np.full((n, 1), 6.0, np.float32),
        ],
        axis=1,
    )
    settings = RenderSettings(
        n_samples=16, n_importance=16, perturb=0.0, noise_std=0.0,
        use_disp=True,
    )
    got = render_rays(params, jnp.asarray(rays), None, settings)
    want = _reference_render(
        params["coarse"], params["fine"], rays, 16, 16, False, use_disp=True
    )
    for k in ["rgb_coarse", "depth_coarse", "rgb_fine", "depth_fine"]:
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k], rtol=1e-3, atol=2e-4, err_msg=k
        )
