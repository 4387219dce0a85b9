"""Tests for pose math and the vectorized forward warp.

The z-buffered warp is validated against an independent painter's-algorithm
reimplementation (small numpy loop, written from the algorithm description) on
tiny images, plus identity/occlusion analytic cases.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sinnerf_tpu.data import poses as P
from sinnerf_tpu.ops.warp import forward_warp, project_pixels, warp_valid_mask


def _simple_k(h, w, f=50.0):
    return np.array(
        [[f, 0, (w - 1) / 2], [0, f, (h - 1) / 2], [0, 0, 1.0]]
    )


def test_rotation_matrices_orthonormal():
    for m in [P.rot_phi(0.3), P.rot_theta(-1.1), P.rot_z(2.0)]:
        r = m[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-12)


def test_rotate_3d_identity():
    c2w = np.eye(4)
    np.testing.assert_allclose(P.rotate_3d(c2w, 0, 0, 0), np.eye(4), atol=1e-12)
    rot = P.rotate_3d(c2w, 10, 20, 30)
    r = rot[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)


def test_convert_roundtrips_camera_center():
    """w2c @ camera_center == origin."""
    rng = np.random.default_rng(0)
    c2w = np.eye(4)
    c2w[:3, :3] = P.rotate_3d(np.eye(4), 15, -25, 40)[:3, :3]
    c2w[:3, 3] = rng.normal(size=3)
    w2c = P.convert_c2w_to_w2c_cv(c2w)
    center_h = np.append(c2w[:3, 3], 1.0)
    out = w2c @ center_h
    np.testing.assert_allclose(out[:3], 0.0, atol=1e-10)


def test_center_poses_average_becomes_identity():
    rng = np.random.default_rng(1)
    poses = []
    for _ in range(5):
        c2w = P.rotate_3d(np.eye(4), *rng.uniform(-20, 20, 3))
        c2w[:3, 3] = rng.normal(size=3)
        poses.append(c2w[:3, :4])
    centered, _ = P.center_poses(np.stack(poses))
    avg = P.average_poses(centered)
    np.testing.assert_allclose(avg[:, 3], 0.0, atol=1e-10)
    np.testing.assert_allclose(avg[:, :3], np.eye(3), atol=1e-8)


def test_rot3d_grid_count():
    grid = P.rot3d_grid(np.eye(4), 20)
    assert grid.shape == (125, 3, 4)
    # center entry (x=y=z=0) is the identity pose
    np.testing.assert_allclose(grid[62], np.eye(4)[:3], atol=1e-12)


def test_spiral_spheric_shapes():
    assert P.create_spiral_poses(np.ones(3), 3.5, 30).shape == (30, 3, 4)
    assert P.create_spheric_poses(1.0, 30).shape == (30, 3, 4)


def test_look_at_rotation_points_at_target():
    pos = np.array([[0.0, 3.0, 0.0]])
    r = P.look_at_rotation(pos, at=(0, 0, 0), up=(0, 0, 1))[0]
    # z axis (third column) points from target to camera
    np.testing.assert_allclose(r[:, 2], [0, 1, 0], atol=1e-7)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-7)


# ------------------------------------------------------------------- warping
def _identity_projs(h, w):
    k = _simple_k(h, w)
    e = np.eye(4)
    return P.projection_matrix(k, e), P.projection_matrix(k, e)


def test_warp_identity_pose_reproduces_image():
    rng = np.random.default_rng(2)
    h, w = 16, 20
    img = rng.uniform(0.1, 1.0, size=(h, w, 3)).astype(np.float32)
    # power-of-two depths make x*d/d exact, avoiding floor() flips at the
    # pixel centers that identity projection lands on
    depth = rng.choice([2.0, 4.0, 8.0], size=(h, w)).astype(np.float32)
    ref_p, src_p = _identity_projs(h, w)
    out, out_d = forward_warp(
        jnp.asarray(img), jnp.asarray(depth), jnp.asarray(ref_p), jnp.asarray(src_p)
    )
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_d), depth, rtol=1e-4)
    assert bool(jnp.all(warp_valid_mask(out)))


def _painters_reference(img, depth, ref_p, src_p):
    """Independent painter's-algorithm implementation (z-buffer by nearest
    depth, sequential scan) for golden comparison."""
    h, w = depth.shape
    xs, ys, ds = project_pixels(
        jnp.asarray(depth), jnp.asarray(ref_p), jnp.asarray(src_p)
    )
    xs = np.clip(np.floor(np.asarray(xs)), 0, w - 1).astype(int).reshape(-1)
    ys = np.clip(np.floor(np.asarray(ys)), 0, h - 1).astype(int).reshape(-1)
    ds = np.asarray(ds).reshape(-1)
    src = img.reshape(-1, img.shape[-1])
    new = np.zeros_like(img)
    new_d = np.zeros((h, w), np.float32)
    for i in range(h * w):
        y, x = ys[i], xs[i]
        if new_d[y, x] == 0 or new_d[y, x] > ds[i]:
            new_d[y, x] = ds[i]
            new[y, x] = src[i]
    return new, new_d


def test_zbuffer_warp_matches_painters_algorithm():
    rng = np.random.default_rng(3)
    h, w = 12, 14
    img = rng.uniform(0.1, 1.0, size=(h, w, 3)).astype(np.float32)
    depth = rng.uniform(2.0, 5.0, size=(h, w)).astype(np.float32)
    k = _simple_k(h, w, f=30.0)
    ref_c2w = np.eye(4)
    src_c2w = P.rotate_3d(np.eye(4), 3.0, -4.0, 2.0)
    src_c2w[:3, 3] += [0.05, -0.03, 0.02]
    ref_p = P.projection_matrix(k, P.convert_c2w_to_w2c_cv(ref_c2w))
    src_p = P.projection_matrix(k, P.convert_c2w_to_w2c_cv(src_c2w))

    got, got_d = forward_warp(
        jnp.asarray(img), jnp.asarray(depth), jnp.asarray(ref_p), jnp.asarray(src_p)
    )
    want, want_d = _painters_reference(img, depth, ref_p, src_p)
    # depths must agree everywhere (z-buffer is deterministic);
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-4, atol=1e-5)
    # rgb can differ only where two splats had exactly equal depth (measure: none here)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_zbuffer_occlusion_prefers_near():
    """Two source pixels landing on the same target: nearer depth must win."""
    h, w = 4, 4
    img = np.zeros((h, w, 3), np.float32)
    img[0, 0] = [1, 0, 0]  # near
    img[2, 2] = [0, 1, 0]  # far
    depth = np.full((h, w), 3.0, np.float32)
    depth[0, 0] = 2.0
    depth[2, 2] = 4.0
    img[depth == 3.0] = 0  # only the two test pixels carry color
    img[0, 0] = [1, 0, 0]
    img[2, 2] = [0, 1, 0]
    # src intrinsics collapse every projected point onto pixel (0,0)
    ref_p = P.projection_matrix(_simple_k(h, w), np.eye(4))
    src_p = P.projection_matrix(
        np.array([[1e-6, 0, 0], [0, 1e-6, 0], [0, 0, 1.0]]), np.eye(4)
    )
    out, out_d = forward_warp(jnp.asarray(img), jnp.asarray(depth), jnp.asarray(ref_p), jnp.asarray(src_p))
    np.testing.assert_allclose(np.asarray(out)[0, 0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(float(out_d[0, 0]), 2.0, rtol=1e-6)


def test_lastwrite_warp_prefers_later_source_pixel():
    """All splats collapse to one target; numpy fancy-assignment semantics
    keep the LAST source pixel in row-major order, regardless of depth."""
    h, w = 1, 4
    img = np.zeros((h, w, 3), np.float32)
    img[0, 0] = [1, 0, 0]  # first, nearest
    img[0, 3] = [0, 1, 0]  # last, farthest
    depth = np.array([[2.0, 3.0, 3.0, 4.0]], np.float32)
    ref_p = P.projection_matrix(_simple_k(h, w), np.eye(4))
    src_p = P.projection_matrix(
        np.array([[1e-6, 0, 0], [0, 1e-6, 0], [0, 0, 1.0]]), np.eye(4)
    )
    out, out_d = forward_warp(
        jnp.asarray(img), jnp.asarray(depth), jnp.asarray(ref_p), jnp.asarray(src_p),
        zbuffer=False,
    )
    np.testing.assert_allclose(np.asarray(out)[0, 0], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(float(out_d[0, 0]), 4.0, rtol=1e-6)
    # z-buffered mode on the same input keeps the nearest instead
    out2, out_d2 = forward_warp(
        jnp.asarray(img), jnp.asarray(depth), jnp.asarray(ref_p), jnp.asarray(src_p),
        zbuffer=True,
    )
    np.testing.assert_allclose(np.asarray(out2)[0, 0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(float(out_d2[0, 0]), 2.0, rtol=1e-6)


def test_zbuffer_equal_depth_keeps_first_writer():
    """Painter parity on exact depth ties: the loop's strict ``>`` keeps the
    incumbent, so among equal-depth splats the FIRST source pixel (row-major)
    wins — pinned by warp_winner's ordinal scatter-min over the tied set."""
    h, w = 1, 4
    img = np.zeros((h, w, 3), np.float32)
    img[0, 1] = [1, 0, 0]  # first of the tied pair
    img[0, 2] = [0, 1, 0]  # second, same depth
    depth = np.array([[5.0, 3.0, 3.0, 5.0]], np.float32)
    ref_p = P.projection_matrix(_simple_k(h, w), np.eye(4))
    src_p = P.projection_matrix(
        np.array([[1e-6, 0, 0], [0, 1e-6, 0], [0, 0, 1.0]]), np.eye(4)
    )
    out, out_d = forward_warp(
        jnp.asarray(img), jnp.asarray(depth), jnp.asarray(ref_p),
        jnp.asarray(src_p), zbuffer=True,
    )
    np.testing.assert_allclose(np.asarray(out)[0, 0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(float(out_d[0, 0]), 3.0, rtol=1e-6)


def test_warp_translation_shifts_pixels():
    """Pure x-translation of the camera shifts the image opposite-wise."""
    h, w = 20, 20
    img = np.zeros((h, w, 3), np.float32)
    img[10, 10] = [1, 1, 1]
    depth = np.full((h, w), 2.0, np.float32)
    k = _simple_k(h, w, f=20.0)
    ref_c2w = np.eye(4)
    src_c2w = np.eye(4)
    src_c2w[0, 3] = 0.5  # camera moves +x (OpenGL world)
    ref_p = P.projection_matrix(k, P.convert_c2w_to_w2c_cv(ref_c2w))
    src_p = P.projection_matrix(k, P.convert_c2w_to_w2c_cv(src_c2w))
    out, _ = forward_warp(jnp.asarray(img), jnp.asarray(depth), jnp.asarray(ref_p), jnp.asarray(src_p))
    ys, xs = np.nonzero(np.asarray(out).sum(-1))
    assert len(xs) >= 1
    # point should appear left of column 10: x' = x - f*t/z = 10 - 20*0.5/2 = 5
    assert abs(int(xs[0]) - 5) <= 1 and int(ys[0]) == 10


def test_patch_winner_gather_matches_full_forward_warp():
    """The sampler's patch-only reconstruction off 1-D winner ordinals
    (sampler.py step 4/5: gather RGB for just the chosen patch) must equal
    the full-image forward_warp at every origin — same hole/value
    semantics, both collision modes."""
    from sinnerf_tpu.data.sampler import strided_patch
    from sinnerf_tpu.ops.warp import warp_winner

    rng = np.random.default_rng(7)
    h, w = 18, 22
    img = rng.uniform(0.1, 1.0, size=(h, w, 3)).astype(np.float32)
    depth = rng.uniform(2.0, 5.0, size=(h, w)).astype(np.float32)
    k = _simple_k(h, w, f=30.0)
    src_c2w = P.rotate_3d(np.eye(4), 4.0, -2.0, 3.0)
    src_c2w[:3, 3] += [0.04, -0.02, 0.03]
    ref_p = P.projection_matrix(k, P.convert_c2w_to_w2c_cv(np.eye(4)))
    src_p = P.projection_matrix(k, P.convert_c2w_to_w2c_cv(src_c2w))

    for zbuffer in (False, True):
        full_rgb, full_d = forward_warp(
            jnp.asarray(img), jnp.asarray(depth),
            jnp.asarray(ref_p), jnp.asarray(src_p), zbuffer=zbuffer,
        )
        win, d_flat = warp_winner(
            jnp.asarray(depth), jnp.asarray(ref_p), jnp.asarray(src_p),
            zbuffer=zbuffer,
        )
        # full-image depth reconstruction (sampler.py step 4)
        rec_d = jnp.where(
            win >= 0, d_flat[jnp.maximum(win, 0)], 0.0
        ).reshape(h, w)
        np.testing.assert_array_equal(np.asarray(rec_d), np.asarray(full_d))

        win_map = win.reshape(h, w)
        rgb_flat = jnp.asarray(img).reshape(-1, 3)
        psx, psy, s_row, s_col = 4, 5, 3, 2
        for ll in range(h - (psx - 1) * s_row):
            for up in range(w - (psy - 1) * s_col):
                win_p = strided_patch(win_map, ll, up, psx, psy, s_row, s_col)
                rec = jnp.where(
                    (win_p >= 0)[..., None],
                    rgb_flat[jnp.maximum(win_p, 0)],
                    0.0,
                )
                want = strided_patch(full_rgb, ll, up, psx, psy, s_row, s_col)
                np.testing.assert_array_equal(np.asarray(rec), np.asarray(want))
