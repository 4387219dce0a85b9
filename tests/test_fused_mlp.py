"""Fused Pallas MLP kernel vs the pure-jnp reference path (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sinnerf_tpu.core.encoding import positional_encoding
from sinnerf_tpu.models.nerf import init_nerf_params, nerf_apply
from sinnerf_tpu.render.renderer import RenderSettings, render_rays


def _inputs(n=700, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    return (
        positional_encoding(jnp.asarray(xyz), 10),
        positional_encoding(jnp.asarray(dirs), 4),
    )


def test_renderer_pallas_impl_matches_xla():
    params = {
        "coarse": init_nerf_params(jax.random.key(5)),
        "fine": init_nerf_params(jax.random.key(6)),
    }
    rng = np.random.default_rng(5)
    n = 64
    rays = np.concatenate(
        [
            rng.normal(size=(n, 3)).astype(np.float32),
            rng.normal(size=(n, 3)).astype(np.float32),
            np.full((n, 1), 2.0, np.float32),
            np.full((n, 1), 6.0, np.float32),
        ],
        axis=1,
    )
    # mlp_impl must be given explicitly: RenderSettings defaults to "pallas",
    # so omitting it here once made this test compare pallas to itself.
    s_xla = RenderSettings(
        n_samples=8, n_importance=8, perturb=0.0, noise_std=0.0, mlp_impl="xla"
    )
    s_pal = RenderSettings(
        n_samples=8, n_importance=8, perturb=0.0, noise_std=0.0, mlp_impl="pallas"
    )
    assert s_xla.mlp_impl != s_pal.mlp_impl
    a = render_rays(params, jnp.asarray(rays), None, s_xla)
    b = render_rays(params, jnp.asarray(rays), None, s_pal)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), rtol=1e-4, atol=1e-5, err_msg=k
        )



# ---------------------------------------------------------------- transposed
def test_nerf_apply_t_matches_row_major():
    from sinnerf_tpu.core.encoding import (
        positional_encoding_blocked_t,
    )
    from sinnerf_tpu.models.nerf import nerf_apply_t

    params = init_nerf_params(jax.random.key(11))
    rng = np.random.default_rng(11)
    xyz = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    dirs = rng.normal(size=(300, 3)).astype(np.float32)
    ref = nerf_apply(
        params,
        positional_encoding(jnp.asarray(xyz), 10),
        positional_encoding(jnp.asarray(dirs), 4),
    )
    got = nerf_apply_t(
        params,
        positional_encoding_blocked_t(jnp.asarray(xyz.T), 10),
        positional_encoding_blocked_t(jnp.asarray(dirs.T), 4),
    )
    np.testing.assert_allclose(np.asarray(got).T, np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_fused_t_matches_reference():
    """The fused kernel does PE in-kernel: it takes RAW (3, N) xyz/dir."""
    from sinnerf_tpu.ops.fused_mlp_t import fused_nerf_mlp_t

    params = init_nerf_params(jax.random.key(12))
    rng = np.random.default_rng(12)
    xyz = rng.uniform(-1, 1, size=(700, 3)).astype(np.float32)
    dirs = rng.normal(size=(700, 3)).astype(np.float32)
    ref = nerf_apply(
        params,
        positional_encoding(jnp.asarray(xyz), 10),
        positional_encoding(jnp.asarray(dirs), 4),
    )
    got = fused_nerf_mlp_t(
        params, jnp.asarray(xyz.T), jnp.asarray(dirs.T), False, True, "float32"
    )
    np.testing.assert_allclose(np.asarray(got).T, np.asarray(ref), rtol=1e-5, atol=1e-5)
    # sigma-only path
    sig_ref = nerf_apply(
        params, positional_encoding(jnp.asarray(xyz), 10), sigma_only=True
    )
    sig = fused_nerf_mlp_t(
        params, jnp.asarray(xyz.T), None, True, True, "float32"
    )
    np.testing.assert_allclose(np.asarray(sig).T, np.asarray(sig_ref), rtol=1e-5, atol=1e-5)


def test_fused_t_grads_match():
    from sinnerf_tpu.ops.fused_mlp_t import fused_nerf_mlp_t

    params = init_nerf_params(jax.random.key(13))
    rng = np.random.default_rng(13)
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(3, 200)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(3, 200)).astype(np.float32))

    def loss_t(p):
        return jnp.mean(
            fused_nerf_mlp_t(p, xyz, dirs, False, True, "float32") ** 2
        )

    def loss_ref(p):
        return jnp.mean(
            nerf_apply(
                p,
                positional_encoding(xyz.T, 10),
                positional_encoding(dirs.T, 4),
            ) ** 2
        )

    g1 = jax.grad(loss_t)(params)
    g2 = jax.grad(loss_ref)(params)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]["w"]), np.asarray(g2[k]["w"]), rtol=1e-4, atol=1e-6,
            err_msg=k,
        )


def test_fused_t_input_grads_and_bf16():
    """Input grads flow through the in-kernel PE adjoint: compare against XLA
    autodiff of (positional_encoding_blocked_t -> nerf_apply_t), which
    differentiates the same double-angle recurrence."""
    from sinnerf_tpu.core.encoding import positional_encoding_blocked_t
    from sinnerf_tpu.ops.fused_mlp_t import fused_nerf_mlp_t

    params = init_nerf_params(jax.random.key(14))
    rng = np.random.default_rng(14)
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(3, 200)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(3, 200)).astype(np.float32))

    def loss_t(x, d):
        return jnp.mean(fused_nerf_mlp_t(params, x, d, False, True, "float32") ** 2)

    def loss_ref(x, d):
        from sinnerf_tpu.models.nerf import nerf_apply_t

        return jnp.mean(
            nerf_apply_t(
                params,
                positional_encoding_blocked_t(x, 10),
                positional_encoding_blocked_t(d, 4),
            )
            ** 2
        )

    gx1, gd1 = jax.grad(loss_t, argnums=(0, 1))(xyz, dirs)
    gx2, gd2 = jax.grad(loss_ref, argnums=(0, 1))(xyz, dirs)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd1), np.asarray(gd2), rtol=1e-4, atol=1e-5)
    # bf16 forward close to f32
    f32 = fused_nerf_mlp_t(params, xyz, dirs, False, True, "float32")
    bf16 = fused_nerf_mlp_t(params, xyz, dirs, False, True, "bfloat16")
    assert np.abs(np.asarray(f32) - np.asarray(bf16)).mean() < 0.05


def test_fused_t_sigma_only_grads():
    from sinnerf_tpu.models.nerf import nerf_apply_t
    from sinnerf_tpu.core.encoding import positional_encoding_blocked_t
    from sinnerf_tpu.ops.fused_mlp_t import fused_nerf_mlp_t

    params = init_nerf_params(jax.random.key(15))
    rng = np.random.default_rng(15)
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(3, 200)).astype(np.float32))
    pe_x = positional_encoding_blocked_t(xyz, 10)

    g1 = jax.grad(
        lambda p: jnp.mean(fused_nerf_mlp_t(p, xyz, None, True, True, "float32") ** 2)
    )(params)
    g2 = jax.grad(
        lambda p: jnp.mean(nerf_apply_t(p, pe_x, None, sigma_only=True) ** 2)
    )(params)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]["w"]), np.asarray(g2[k]["w"]), rtol=1e-4, atol=1e-6,
            err_msg=k,
        )


def test_row_major_blocked_pe_layout():
    """The row-major blocked PE + pe_layout='blocked' apply path (kept for
    API completeness) matches the reference layout."""
    from sinnerf_tpu.core.encoding import positional_encoding_blocked

    params = init_nerf_params(jax.random.key(16))
    rng = np.random.default_rng(16)
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(100, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    ref = nerf_apply(
        params, positional_encoding(xyz, 10), positional_encoding(dirs, 4)
    )
    blk = nerf_apply(
        params,
        positional_encoding_blocked(xyz, 10),
        positional_encoding_blocked(dirs, 4),
        pe_layout="blocked",
    )
    np.testing.assert_allclose(np.asarray(blk), np.asarray(ref), rtol=1e-5, atol=1e-6)


# ------------------------------------------------------- fused render kernel
def test_fused_render_level_matches_composite():
    """The per-ray fused render kernel (PE + MLP + online compositing) equals
    query+composite_t, including white background, a ray count that is not a
    tile multiple, and a sample count that is not a sublane multiple."""
    from sinnerf_tpu.core.composite import composite_t
    from sinnerf_tpu.core.sampling import stratified_z_vals
    from sinnerf_tpu.ops.fused_render_t import fused_render_level
    from sinnerf_tpu.render.renderer import RenderSettings, _query_t

    params = init_nerf_params(jax.random.key(21))
    rng = np.random.default_rng(21)
    n, s = 111, 12  # n % R_TILE != 0, s % 8 != 0
    o = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
    near = jnp.full((n, 1), 2.0)
    far = jnp.full((n, 1), 6.0)
    z_vals = stratified_z_vals(near, far, s)

    for white_back in (False, True):
        rgb, depth, weights = fused_render_level(
            params, jnp.concatenate([o, d], axis=0), z_vals,
            white_back=white_back,
        )
        settings = RenderSettings(perturb=0.0, noise_std=0.0, mlp_impl="xla")
        out = _query_t(params, o, d, z_vals, settings, False)
        ref = composite_t(out[0:3], out[3], z_vals, d.T, white_back=white_back)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref.rgb),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(weights), np.asarray(ref.weights),
                                   rtol=1e-5, atol=1e-5)


def test_fused_sample_pdf_merge_matches_xla():
    """The fused resample+merge kernel equals sample_pdf + sort for the det
    and stratified-sorted stochastic cases, across sample counts that are
    and are not sublane multiples."""
    from sinnerf_tpu.core.sampling import sample_pdf, stratified_z_vals
    from sinnerf_tpu.ops.fused_sample_pdf_t import fused_sample_pdf_merge

    rng = np.random.default_rng(31)
    for n, s, k in ((77, 8, 8), (64, 10, 12), (33, 64, 64)):
        near = jnp.full((n, 1), 2.0)
        far = jnp.full((n, 1), 6.0)
        z_vals = stratified_z_vals(near, far, s)
        weights = jnp.asarray(rng.uniform(0, 1, size=(n, s)).astype(np.float32))
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])

        # det
        zf = sample_pdf(z_mid, weights[:, 1:-1], k, det=True)
        ref = jnp.sort(jnp.concatenate([z_vals, zf], axis=-1), axis=-1)
        got = fused_sample_pdf_merge(z_vals, weights, k, det=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

        # stochastic stratified (sorted_u): same uniforms fed to both
        key = jax.random.key(7)
        u = jax.random.uniform(key, (n, k), dtype=z_vals.dtype)
        zf = sample_pdf(z_mid, weights[:, 1:-1], k, det=False, key=key,
                        sorted_u=True)
        ref = jnp.sort(jnp.concatenate([z_vals, zf], axis=-1), axis=-1)
        got = fused_sample_pdf_merge(z_vals, weights, k, u=u, det=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_fused_render_level_train_fwd_and_grads():
    """The per-ray TRAINING kernel (ops/fused_render_train_t.py): forward
    equals composite_t(fused_nerf_mlp_t(...)) with sigma noise, and the fused
    backward's parameter grads match autodiff through that composition (the
    per-point backward kernel, itself verified against XLA autodiff).  Odd
    ray counts and non-multiple-of-8 sample counts exercise the padding."""
    from sinnerf_tpu.core.composite import composite_t
    from sinnerf_tpu.core.sampling import stratified_z_vals
    from sinnerf_tpu.ops.fused_mlp_t import fused_nerf_mlp_t
    from sinnerf_tpu.ops.fused_render_train_t import fused_render_level_train

    params = init_nerf_params(jax.random.key(21))
    rng = np.random.default_rng(21)

    for n, s, white, use_noise in (
        (77, 12, False, True),
        (40, 8, True, False),
        (33, 16, True, True),
    ):
        o = rng.normal(size=(n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        rays_t = jnp.asarray(np.concatenate([o, d], axis=1).T)  # (6, N)
        near = jnp.full((n, 1), 2.0)
        far = jnp.full((n, 1), 6.0)
        z = stratified_z_vals(near, far, s)
        noise = (
            jnp.asarray(rng.normal(size=(n, s)).astype(np.float32))
            if use_noise
            else None
        )

        def ref_level(p):
            out = fused_nerf_mlp_t(
                p,
                (o.T[:, :, None] + d.T[:, :, None] * np.asarray(z)[None]).reshape(3, n * s),
                jnp.broadcast_to(jnp.asarray(d.T)[:, :, None], (3, n, s)).reshape(3, n * s),
                False, True, "float32",
            ).reshape(4, n, s)
            sig = out[3]
            if noise is not None:
                sig = sig + noise
            comp = composite_t(out[0:3], sig, z, jnp.asarray(d), white_back=white)
            return comp.rgb, comp.depth, comp.weights

        rgb_ref, depth_ref, w_ref = ref_level(params)
        rgb, depth, w = fused_render_level_train(
            params, rays_t, z, noise, True, white, "float32"
        )
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(depth_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                                   rtol=1e-4, atol=1e-5)

        # parameter grads through a loss touching all three outputs
        tgt = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))

        def loss_fused(p):
            rgb, depth, w = fused_render_level_train(
                p, rays_t, z, noise, True, white, "float32"
            )
            return (
                jnp.sum((rgb - tgt) ** 2)
                + jnp.sum(depth**2) * 0.1
                + jnp.sum(w**2) * 0.01
            )

        def loss_ref(p):
            rgb, depth, w = ref_level(p)
            return (
                jnp.sum((rgb - tgt) ** 2)
                + jnp.sum(depth**2) * 0.1
                + jnp.sum(w**2) * 0.01
            )

        g_fused = jax.grad(loss_fused)(params)
        g_ref = jax.grad(loss_ref)(params)
        # tolerance note: around saturated alphas the 1e10 last-interval
        # delta makes the composite gradient ill-conditioned in f32 — the
        # pure-XLA f32 reference itself deviates from an f64 ground truth
        # by up to 4.0e-3 normalized on these combos (measured), and the
        # fused adjoint lands within the same band (<= 5.5e-3 vs the f32
        # reference).  The true dsig at saturation is annihilated by the
        # (1 - alpha) = 0 factor on both paths, so this is conditioning
        # noise, not structure.
        for k in g_ref:
            for leaf in ("w", "b"):
                a_ = np.asarray(g_ref[k][leaf])
                b_ = np.asarray(g_fused[k][leaf])
                scale = np.abs(a_).max() + 1e-8
                np.testing.assert_allclose(
                    b_ / scale, a_ / scale, rtol=1e-2, atol=1e-2,
                    err_msg=f"{k}/{leaf} (n={n}, s={s})",
                )


def test_fused_sample_pdf_merge_single_importance_sample():
    """K=1 deterministic: the reference linspace(0, 1, 1) == [0.0]; the
    kernel's i/(k-1) needed a 0/0 guard."""
    from sinnerf_tpu.core.sampling import sample_pdf, stratified_z_vals
    from sinnerf_tpu.ops.fused_sample_pdf_t import fused_sample_pdf_merge

    rng = np.random.default_rng(3)
    n, s = 40, 8
    near = jnp.full((n, 1), 2.0)
    far = jnp.full((n, 1), 6.0)
    z_vals = stratified_z_vals(near, far, s)
    weights = jnp.asarray(rng.uniform(0, 1, size=(n, s)).astype(np.float32))
    z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
    zf = sample_pdf(z_mid, weights[:, 1:-1], 1, det=True)
    ref = jnp.sort(jnp.concatenate([z_vals, zf], axis=-1), axis=-1)
    got = fused_sample_pdf_merge(z_vals, weights, 1, det=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_renderer_pallas_stochastic_training_path_matches_xla():
    """The full stochastic training render (stratified jitter + fused
    sample_pdf + sigma noise + per-ray train kernels) equals the XLA path
    under the SAME key: every RNG draw (perturb, noise, importance u) is
    constructed with identical key/shape on both paths.  Parameter grads
    compared too — this is the end-to-end regression for the train kernels
    inside render_rays."""
    params = {
        "coarse": init_nerf_params(jax.random.key(31)),
        "fine": init_nerf_params(jax.random.key(32)),
    }
    rng = np.random.default_rng(31)
    n = 64
    rays = jnp.asarray(np.concatenate(
        [
            rng.normal(size=(n, 3)).astype(np.float32),
            rng.normal(size=(n, 3)).astype(np.float32),
            np.full((n, 1), 2.0, np.float32),
            np.full((n, 1), 6.0, np.float32),
        ],
        axis=1,
    ))
    key = jax.random.key(9)
    # mlp_impl="xla" is load-bearing: RenderSettings defaults to "pallas" and
    # omitting it made this test vacuously compare the pallas path to itself.
    s_xla = RenderSettings(n_samples=8, n_importance=8, perturb=1.0,
                           noise_std=1.0, white_back=True, mlp_impl="xla")
    s_pal = RenderSettings(n_samples=8, n_importance=8, perturb=1.0,
                           noise_std=1.0, white_back=True, mlp_impl="pallas")
    assert s_xla.mlp_impl != s_pal.mlp_impl
    a = render_rays(params, rays, key, s_xla)
    b = render_rays(params, rays, key, s_pal)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), rtol=1e-4, atol=1e-4, err_msg=k
        )

    tgt = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))

    def loss(p, settings):
        out = render_rays(p, rays, key, settings)
        return (
            jnp.sum((out["rgb_fine"] - tgt) ** 2)
            + jnp.sum((out["rgb_coarse"] - tgt) ** 2)
            + 0.1 * jnp.sum(out["depth_fine"] ** 2)
        )

    g_xla = jax.grad(loss)(params, s_xla)
    g_pal = jax.grad(loss)(params, s_pal)
    for lvl in g_xla:
        for layer in g_xla[lvl]:
            for leaf in ("w", "b"):
                a_ = np.asarray(g_xla[lvl][layer][leaf])
                b_ = np.asarray(g_pal[lvl][layer][leaf])
                scale = np.abs(a_).max() + 1e-8
                # A sample landing exactly on an inverse-CDF bin boundary can
                # route to the neighboring bin on one path (masked-extrema vs
                # searchsorted tie-breaks), perturbing a handful of elements;
                # bound the global error tightly and the per-element error
                # loosely enough to tolerate those ties.
                rel_l2 = np.linalg.norm(a_ - b_) / (np.linalg.norm(a_) + 1e-8)
                assert rel_l2 < 1e-2, f"{lvl}/{layer}/{leaf}: rel_l2={rel_l2}"
                np.testing.assert_allclose(
                    b_ / scale, a_ / scale, rtol=3e-2, atol=3e-2,
                    err_msg=f"{lvl}/{layer}/{leaf}",
                )


def test_fused_render_level_train_input_grads_are_stop_gradient_zeros():
    """The public train-kernel entry stop_gradients rays/z/noise itself, so a
    caller differentiating w.r.t. ray geometry gets exact stop_gradient
    semantics (zeros) by construction — never silently-wrong values from the
    params-only custom VJP (ADVICE r2: safety used to rest on renderer
    discipline alone)."""
    from sinnerf_tpu.ops.fused_render_train_t import fused_render_level_train

    params = init_nerf_params(jax.random.key(3))
    rng = np.random.default_rng(3)
    n, s = 16, 8
    rays_t = jnp.asarray(rng.normal(size=(6, n)).astype(np.float32))
    z = jnp.asarray(np.sort(rng.uniform(2, 6, size=(n, s)).astype(np.float32)))

    def loss_wrt_rays(r):
        rgb, depth, w = fused_render_level_train(params, r, z, None)
        return jnp.sum(rgb) + jnp.sum(depth)

    g_rays = jax.grad(loss_wrt_rays)(rays_t)
    np.testing.assert_array_equal(np.asarray(g_rays), 0.0)

    def loss_wrt_z(zz):
        rgb, depth, w = fused_render_level_train(params, rays_t, zz, None)
        return jnp.sum(rgb * depth[:, None])

    g_z = jax.grad(loss_wrt_z)(z)
    np.testing.assert_array_equal(np.asarray(g_z), 0.0)

    # params grads still flow through the public wrapper (sigma noise makes
    # some samples clear the relu gate at a random init)
    noise = jnp.asarray(rng.normal(size=(n, s)).astype(np.float32)) * 3.0

    def loss_params(p):
        rgb, depth, w = fused_render_level_train(p, rays_t, z, noise)
        return jnp.sum(rgb) + jnp.sum(depth)

    g_p = jax.grad(loss_params)(params)
    total = sum(
        float(jnp.abs(leaf).sum()) for leaf in jax.tree_util.tree_leaves(g_p)
    )
    assert total > 0
