"""Dataset-family tests: build each loader on a synthetic miniature scene and
check the emitted batch schema/shapes against the reference contract
(SURVEY.md §2 items 16-20)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from sinnerf_tpu.data import dataset_dict
from sinnerf_tpu.data.depth_io import read_pfm, save_pfm
from sinnerf_tpu.data.synthetic import (
    make_blender_scene,
    make_dtu_scene,
    make_llff_scene,
)

PSX, PSY = 12, 12
NUM_RAYS = 256


@pytest.fixture(scope="module")
def blender_root(tmp_path_factory):
    return make_blender_scene(str(tmp_path_factory.mktemp("blender")), (64, 64))


@pytest.fixture(scope="module")
def llff_root(tmp_path_factory):
    return make_llff_scene(str(tmp_path_factory.mktemp("llff")), (64, 48))


@pytest.fixture(scope="module")
def dtu_root(tmp_path_factory):
    return make_dtu_scene(str(tmp_path_factory.mktemp("dtu")), (64, 64))


def _check_batch_schema(batch, psx, psy, num_rays, bs=1, n_proj=None):
    n_proj = num_rays if n_proj is None else n_proj
    want = {
        "rays": (bs, num_rays, 8),
        "rgbs": (bs, num_rays, 3),
        "depth": (bs, num_rays, 1),
        "rays_proj": (bs, n_proj, 8),
        "depth_proj": (bs, n_proj, 1),
        "real_patch": (bs, 3, psx, psy),
        "rays_full": (bs, psx * psy, 8),
        "warp_patch": (bs, 3, psx, psy),
        "warp_patch_depth": (bs, psx, psy),
        "depth_ray": (bs, psx * psy, 8),
        "depth_gt": (bs, psx * psy, 1),
        "depth_ray_rgb": (bs, psx * psy, 3),
    }
    assert set(batch) == set(want)
    for k, shape in want.items():
        assert batch[k].shape == shape, f"{k}: {batch[k].shape} != {shape}"
        assert np.isfinite(np.asarray(batch[k])).all(), f"{k} has non-finite"


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    depth = rng.uniform(1, 10, size=(13, 17)).astype(np.float32)
    path = str(tmp_path / "d.pfm")
    save_pfm(path, depth)
    back, scale = read_pfm(path)
    np.testing.assert_array_equal(back, depth)


def test_blender_rot3d_train(blender_root):
    ds = dataset_dict["blender_ray_patch_1image_rot3d"](
        blender_root,
        split="train",
        img_wh=(64, 64),
        patch_size=PSX,
        sW=2,
        sH=2,
        angle=20,
        ref_idx=0,
        num_rays=NUM_RAYS,
    )
    assert ds.white_back
    assert len(ds) == 125  # rot3d pseudo-pose grid
    batch = ds.sample(jax.random.key(0), step=0)
    _check_batch_schema(batch, PSX, PSY, NUM_RAYS)
    # near/far planes packed into every ray
    np.testing.assert_allclose(np.asarray(batch["rays"])[..., 6], 2.0)
    np.testing.assert_allclose(np.asarray(batch["rays"])[..., 7], 6.0)
    # real patch comes from the ref image: rejection keeps some object pixels
    assert float(np.max(np.asarray(batch["real_patch"]))) > 0
    # proj depths positive (holes are excluded from the pool)
    assert float(np.min(np.asarray(batch["depth_proj"]))) > 0


def test_blender_rot3d_batch_and_determinism(blender_root):
    ds = dataset_dict["blender_ray_patch_1image_rot3d"](
        blender_root, split="train", img_wh=(64, 64), patch_size=PSX,
        ref_idx=0, num_rays=NUM_RAYS,
    )
    b2 = ds.sample(jax.random.key(3), step=5, batch_size=2)
    _check_batch_schema(b2, PSX, PSY, NUM_RAYS, bs=2)
    again = ds.sample(jax.random.key(3), step=5, batch_size=2)
    np.testing.assert_array_equal(
        np.asarray(b2["rays_full"]), np.asarray(again["rays_full"])
    )
    other = ds.sample(jax.random.key(4), step=5, batch_size=2)
    assert not np.allclose(np.asarray(b2["rays"]), np.asarray(other["rays"]))


def test_blender_val(blender_root):
    ds = dataset_dict["blender_ray_patch_1image_rot3d"](
        blender_root, split="val", img_wh=(64, 64), ref_idx=0, angle=20,
    )
    item = ds.val_item(0)
    assert item["rays"].shape == (64 * 64, 8)
    assert item["rgbs"].shape == (64 * 64, 3)


def test_blender_test_train_split_renders_all_train_frames(blender_root):
    """test_train reads transforms_train.json and renders every frame,
    emitting fname per frame so eval.py names files like the reference
    (blender_rot3d.py:180-181, :568-569)."""
    import json
    import os

    meta = json.load(open(os.path.join(blender_root, "transforms_train.json")))
    ds = dataset_dict["blender_ray_patch_1image_rot3d"](
        blender_root, split="test_train", img_wh=(64, 64), ref_idx=0, angle=20,
    )
    assert ds.val_len() == len(meta["frames"])
    for i, frame in enumerate(meta["frames"]):
        item = ds.val_item(i)
        assert item["fname"] == frame["file_path"]
        assert item["rays"].shape == (64 * 64, 8)
        assert item["rgbs"].shape == (64 * 64, 3)
    # plain val emits no fname (reference: only split.endswith('train') does)
    ds = dataset_dict["blender_ray_patch_1image_rot3d"](
        blender_root, split="val", img_wh=(64, 64), ref_idx=0, angle=20,
    )
    assert "fname" not in ds.val_item(0)


def test_blender_test_train2_is_rot_z_orbit(blender_root):
    """test_train2 renders 30 rot-z poses around the ref pose
    (blender_rot3d.py:414-420, poses consumed at :537-538), GT = the ref
    frame's image (intent reconstruction: the reference getitem crashes on an
    unbound `frame` for this split), and emits no fname
    ('test_train2'.endswith('train') is False, :568-569)."""
    import json
    import os

    from sinnerf_tpu.data import poses as pose_np
    from sinnerf_tpu.data.base import pack_rays_np
    from sinnerf_tpu.data.blender import NEAR, FAR

    meta = json.load(open(os.path.join(blender_root, "transforms_train.json")))
    ds = dataset_dict["blender_ray_patch_1image_rot3d"](
        blender_root, split="test_train2", img_wh=(64, 64), ref_idx=0,
        angle=20,
    )
    assert ds.val_len() == 30
    ref_c2w = np.array(meta["frames"][0]["transform_matrix"], np.float64)
    expect = pose_np.rot_z_linspace(ref_c2w, 20, n=30)
    for i in (0, 14, 29):
        item = ds.val_item(i)
        assert "fname" not in item
        want = pack_rays_np(np.asarray(ds.directions), expect[i], NEAR, FAR)
        np.testing.assert_allclose(item["rays"], want, atol=1e-5)
    # all 30 GT images are the reference frame's image
    np.testing.assert_array_equal(
        ds.val_item(0)["rgbs"], ds.val_item(29)["rgbs"]
    )


def test_blender_test_train_with_gt_depth_renders_train_frames(blender_root):
    """depth_type='gt' rebinds the working meta to transforms_mytest.json in
    __init__ (blender_rot3d.py:242-252), but the reference reads the train
    json for test_train unconditionally (:180-181) — the split must render
    and name the TRAIN frames, not the mytest frames."""
    import json
    import os

    meta = json.load(open(os.path.join(blender_root, "transforms_train.json")))
    ds = dataset_dict["blender_ray_patch_1image_rot3d"](
        blender_root, split="test_train", img_wh=(64, 64), ref_idx=0,
        angle=20, depth_type="gt",
    )
    assert ds.val_len() == len(meta["frames"])
    assert ds.val_fnames == [f["file_path"] for f in meta["frames"]]


def test_blender_proj_train(blender_root):
    ds = dataset_dict["blender_ray_patch_1image_proj"](
        blender_root, split="train", img_wh=(64, 64), patch_size=PSX,
        ref_idx=0, num_rays=NUM_RAYS,
    )
    assert len(ds) == 60  # rot_z linspace bank
    # proj batch composition (blender_proj.py:464-476): num nonzero + num
    # any-pixel random rays (2*num total) but only num proj rays; real patch
    # rejected on mean>0.01; the warp patch is a single unrejected draw
    assert ds.cfg.num_rays == 2 * NUM_RAYS
    assert ds.cfg.n_any == NUM_RAYS
    assert ds.cfg.n_proj == NUM_RAYS
    assert not ds.cfg.fresh_warp
    assert ds.cfg.reject_real_patch == "mean_gt_001"
    assert not ds.cfg.reject_warp_patch
    batch = ds.sample(jax.random.key(1), step=0)
    _check_batch_schema(batch, PSX, PSY, 2 * NUM_RAYS, n_proj=NUM_RAYS)


def test_blender_gt_depth_switches_to_mytest_meta(tmp_path):
    """depth_type='gt' re-reads transforms_mytest.json and pins the reference
    frame to mytest index 29 for my_testset scenes (blender_rot3d.py:242-252);
    an explicit ref_idx keeps unknown scenes usable."""
    import json

    root = make_blender_scene(str(tmp_path / "lego"), (64, 64))
    # gt depth lives in my_testset/<image>_400.npy (blender_rot3d.py:343-347)
    os.makedirs(os.path.join(root, "my_testset"), exist_ok=True)
    rng = np.random.default_rng(5)
    np.save(
        os.path.join(root, "my_testset", "r_0_400.npy"),
        rng.uniform(2.0, 5.0, size=(64, 64)).astype(np.float32),
    )
    with open(os.path.join(root, "transforms_mytest.json")) as f:
        mytest = json.load(f)

    ds = dataset_dict["blender_ray_patch_1image_rot3d"](
        root, split="train", img_wh=(64, 64), patch_size=PSX,
        num_rays=NUM_RAYS, depth_type="gt",
    )
    assert ds.ref_idx == 29
    np.testing.assert_allclose(
        ds.ref_c2w, np.array(mytest["frames"][29]["transform_matrix"])
    )

    # explicit ref_idx wins for scenes outside the lego/hotdog table
    plain = make_blender_scene(str(tmp_path / "plain"), (64, 64))
    os.makedirs(os.path.join(plain, "my_testset"), exist_ok=True)
    np.save(
        os.path.join(plain, "my_testset", "r_0_400.npy"),
        rng.uniform(2.0, 5.0, size=(64, 64)).astype(np.float32),
    )
    ds2 = dataset_dict["blender_ray_patch_1image_rot3d"](
        plain, split="train", img_wh=(64, 64), patch_size=PSX,
        num_rays=NUM_RAYS, depth_type="gt", ref_idx=3,
    )
    assert ds2.ref_idx == 3


def test_llff_proj_train(llff_root):
    ds = dataset_dict["llff_ray_patch_1image_proj"](
        llff_root,
        split="train",
        img_wh=(64, 48),
        patch_size_x=PSX,
        patch_size_y=16,
        sW=2,
        sH=2,
        num_rays=NUM_RAYS,
    )
    assert not ds.white_back
    batch = ds.sample(jax.random.key(0), step=0)
    _check_batch_schema(batch, PSX, 16, NUM_RAYS)
    # LLFF near/far derive from the bounds rescale: near ~ 0.9/0.75 = 1.2
    np.testing.assert_allclose(np.asarray(batch["rays"])[..., 6], 1.2, rtol=1e-5)


def test_llff_proj_val_and_test(llff_root):
    val = dataset_dict["llff_ray_patch_1image_proj"](
        llff_root, split="val", img_wh=(64, 48)
    )
    assert val.val_len() == 5
    item = val.val_item(2)
    assert item["rays"].shape == (48 * 64, 8)
    test = dataset_dict["llff_ray_patch_1image_proj"](
        llff_root, split="test", img_wh=(64, 48)
    )
    assert test.val_len() == 120  # spiral path


def test_llff_spheric_near_far(llff_root):
    """The spheric val/test branch packs near=bounds.min(),
    far=min(8*near, bounds.max()) instead of the DSNeRF pair
    (llff.py:364-366, llff_proj.py:684-690)."""
    for name in ("llff", "llff_ray_patch_1image_proj"):
        ds = dataset_dict[name](
            llff_root, split="test", img_wh=(64, 48), spheric_poses=True
        )
        near = float(ds.bounds.min())
        far = min(8 * near, float(ds.bounds.max()))
        rays = np.asarray(ds.val_item(0)["rays"])
        np.testing.assert_allclose(rays[:, 6], near, rtol=1e-6)
        np.testing.assert_allclose(rays[:, 7], far, rtol=1e-6)
        # the non-spheric path keeps the DSNeRF pair
        ds_flat = dataset_dict[name](llff_root, split="test", img_wh=(64, 48))
        rays_flat = np.asarray(ds_flat.val_item(0)["rays"])
        np.testing.assert_allclose(rays_flat[:, 6], ds_flat.near, rtol=1e-6)
        np.testing.assert_allclose(rays_flat[:, 7], ds_flat.far, rtol=1e-6)


def test_llff_eval_dataset(llff_root):
    ds = dataset_dict["llff"](llff_root, split="val", img_wh=(64, 48))
    assert ds.val_len() == 1
    item = ds.val_item(0)
    assert item["rays"].shape == (48 * 64, 8)
    assert item["rgbs"].shape == (48 * 64, 3)
    test = dataset_dict["llff"](llff_root, split="test", img_wh=(64, 48))
    assert test.val_len() == 120


def test_dtu_train(dtu_root):
    ds = dataset_dict["dtu_proj"](
        dtu_root,
        split="train",
        img_wh=(64, 64),
        scan=4,
        patch_size_x=PSX,
        patch_size_y=PSY,
        num_rays=NUM_RAYS,
    )
    assert ds.white_back
    assert len(ds) == 3  # one pseudo view per src view
    batch = ds.sample(jax.random.key(0), step=0)
    _check_batch_schema(batch, PSX, PSY, NUM_RAYS)
    # near/far from the cam file: 425*1/200 = 2.125, + 2.5*192/200
    np.testing.assert_allclose(np.asarray(batch["rays"])[..., 6], 2.125, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(batch["rays"])[..., 7], 2.125 + 2.5 * 192 / 200, rtol=1e-5
    )


def test_dtu_val(dtu_root):
    ds = dataset_dict["dtu_proj"](dtu_root, split="val", img_wh=(64, 64), scan=4)
    assert ds.val_len() == 4  # ref + 3 src poses
    item = ds.val_item(0)
    assert item["rays"].shape == (64 * 64, 8)


def test_blender_warp_patch_consistency(blender_root):
    """depth_ray / depth_gt / depth_ray_rgb share the warp patch origin: the
    gathered ref rays must match ref_rays at the strided offsets."""
    ds = dataset_dict["blender_ray_patch_1image_rot3d"](
        blender_root, split="train", img_wh=(64, 64), patch_size=PSX,
        ref_idx=0, num_rays=NUM_RAYS,
    )
    batch = ds.sample(jax.random.key(7), step=0)
    depth_ray = np.asarray(batch["depth_ray"])[0]
    # the full ref-view ray grid, reconstructed host-side (the scene bundle
    # derives depth_ray from the direction patch instead of keeping it)
    from sinnerf_tpu.data.base import pack_rays_np

    ref_rays = pack_rays_np(
        np.asarray(ds.scene["directions"]),
        np.asarray(ds.scene["ref_c2w"]),
        2.0,
        6.0,
    )
    # every depth_ray row exists in the ref ray grid
    assert all(
        np.isclose(ref_rays, depth_ray[i], atol=1e-5).all(axis=1).any()
        for i in range(0, PSX * PSY, 37)
    )


# ---------------------------------------------------------------------------
# Rich multi-view-consistent scenes (the soak-scale generators)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rich_llff_root(tmp_path_factory):
    from sinnerf_tpu.data.synthetic import make_llff_scene_rich

    return make_llff_scene_rich(
        str(tmp_path_factory.mktemp("rich_llff")), img_wh=(126, 94), n_images=10
    )


@pytest.fixture(scope="module")
def rich_dtu_root(tmp_path_factory):
    from sinnerf_tpu.data.synthetic import make_dtu_scene_rich

    return make_dtu_scene_rich(
        str(tmp_path_factory.mktemp("rich_dtu")), img_wh=(160, 128), n_src=8
    )


def test_rich_llff_scene_multiview_consistent(rich_llff_root):
    """The z-buffer warp of the reference view into every other pose must
    agree with the tracer's own render of that pose (same analytic scene) on
    valid pixels — the property that makes converged val PSNR meaningful."""
    from sinnerf_tpu.data.base import load_image
    from sinnerf_tpu.data.llff import LLFFProj

    ds = LLFFProj(
        rich_llff_root, split="train", img_wh=(126, 94),
        patch_size_x=63, patch_size_y=84, sW=1, sH=1,
    )
    bank = np.asarray(ds.scene["bank_rgb"]).transpose(0, 2, 3, 1)  # back to (P,H,W,3)
    for k in range(len(ds.image_paths)):
        true = load_image(ds.image_paths[k], (126, 94))
        valid = bank[k].sum(-1) != 0
        assert valid.mean() > 0.5, f"pose {k}: warp coverage too low"
        err = ((bank[k] - true) ** 2)[valid].mean()
        psnr = -10 * np.log10(err)
        assert psnr > 22, f"pose {k}: warp vs true render {psnr:.1f} dB"
    # depth strictly inside the parsed frustum
    rd = np.asarray(ds.scene["ref_depth"])
    assert rd.min() > ds.near and rd.max() < ds.far


def test_rich_dtu_scene_multiview_consistent(rich_dtu_root):
    from sinnerf_tpu.data.base import load_image
    from sinnerf_tpu.data.dtu import DTUProj

    ds = DTUProj(
        rich_dtu_root, split="train", img_wh=(160, 128),
        patch_size_x=56, patch_size_y=70, sW=1, sH=1,
    )
    bank = np.asarray(ds.scene["bank_rgb"]).transpose(0, 2, 3, 1)  # back to (P,H,W,3)
    for k, vid in enumerate(ds.src_views):
        true = load_image(ds._img_path(vid), (160, 128), resample="bilinear")
        valid = bank[k].sum(-1) != 0
        assert valid.mean() > 0.4, f"src {vid}: warp coverage too low"
        err = ((bank[k] - true) ** 2)[valid].mean()
        psnr = -10 * np.log10(err)
        assert psnr > 20, f"src {vid}: warp vs true render {psnr:.1f} dB"
    rd = np.asarray(ds.scene["ref_depth"])
    assert rd.min() > ds.near and rd.max() < ds.far
    # mean_gt_001 patch rejection must accept this scene (depth ~2.5-4.0)
    assert rd.mean() > 0.01


def test_dtu_intrinsics_track_img_wh(rich_dtu_root):
    """Loading at a non-native --img_wh must rescale K with the image resize
    (the reference keeps native-res intrinsics at any size, silently halving
    the FOV at half resolution; deviation documented in DTUProj._load_cam)."""
    from sinnerf_tpu.data.dtu import DTUProj

    full = DTUProj(rich_dtu_root, split="val", img_wh=(160, 128))
    half = DTUProj(rich_dtu_root, split="val", img_wh=(80, 64))
    np.testing.assert_allclose(half.k3[:2], full.k3[:2] * 0.5, rtol=1e-6)
    # same camera FOV: the corner ray directions must agree after
    # normalization (the grids sample the same frustum at different density)
    d_full = np.asarray(full.directions).reshape(128, 160, 3)
    d_half = np.asarray(half.directions).reshape(64, 80, 3)
    a = d_full[0, 0] / np.linalg.norm(d_full[0, 0])
    b = d_half[0, 0] / np.linalg.norm(d_half[0, 0])
    np.testing.assert_allclose(a, b, atol=5e-3)


# ---------------------------------------------------------------- origins
def _brute_force_origins(img, cfg):
    """O(origins * patch) reference for compute_real_origins."""
    from sinnerf_tpu.data.sampler import strided_patch

    valid = []
    for ll in range(cfg.row_limit):
        for up in range(cfg.col_limit):
            rows = ll + np.arange(cfg.psx) * cfg.s_row
            cols = up + np.arange(cfg.psy) * cfg.s_col
            patch = img[rows[:, None], cols[None, :]]
            if cfg.reject_real_patch == "max_nonzero":
                ok = patch.max() != 0
            else:
                ok = patch.mean() > 0.01
            if ok:
                valid.append(ll * cfg.col_limit + up)
    return np.array(valid, np.int32)


@pytest.mark.parametrize("mode", ["max_nonzero", "mean_gt_001"])
def test_compute_real_origins_matches_brute_force(mode):
    """The separable strided reduction enumerates exactly the origins the
    reference's rejection loop (blender_rot3d.py:451-460) would accept."""
    from sinnerf_tpu.data.sampler import SamplerConfig, compute_real_origins

    rng = np.random.default_rng(3)
    img = np.zeros((40, 48, 3), np.float32)
    # sparse blobs so both accept and reject origins exist
    for _ in range(6):
        r, c = rng.integers(0, 30), rng.integers(0, 38)
        img[r : r + 4, c : c + 4] = rng.random((4, 4, 3))
    cfg = SamplerConfig(
        height=40, width=48, psx=5, psy=5, s_row=3, s_col=2,
        reject_real_patch=mode,
    )
    got = compute_real_origins(img, cfg)
    want = _brute_force_origins(img, cfg)
    assert 0 < len(want) < cfg.row_limit * cfg.col_limit  # non-trivial case
    np.testing.assert_array_equal(np.sort(got), want)


def test_compute_real_origins_all_invalid_raises():
    from sinnerf_tpu.data.sampler import SamplerConfig, compute_real_origins

    cfg = SamplerConfig(
        height=32, width=32, psx=4, psy=4, reject_real_patch="max_nonzero"
    )
    with pytest.raises(ValueError, match="no valid real-patch origin"):
        compute_real_origins(np.zeros((32, 32, 3), np.float32), cfg)


def test_sampled_real_patch_always_valid(blender_root):
    """With the precomputed origin list every drawn real patch satisfies the
    rejection predicate — no 'all candidates invalid' fallback remains."""
    ds = dataset_dict["blender_ray_patch_1image_rot3d"](
        blender_root, img_wh=(64, 64), patch_size=PSX, sW=2, sH=2,
        num_rays=NUM_RAYS, with_ref=True, load_depth=True, depth_type="nerf",
        ref_idx=0,
    )
    assert "real_origins" in ds.scene
    key = jax.random.key(11)
    for step in range(8):
        key, k = jax.random.split(key)
        batch = ds.sample(k, step=step, batch_size=2)
        for b in range(2):
            assert float(np.max(np.asarray(batch["real_patch"][b]))) > 0


def test_strided_sum_map_matches_patches():
    from sinnerf_tpu.data.sampler import (
        SamplerConfig, _strided_sum_map, strided_patch,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((30, 26)).astype(np.float32))
    cfg = SamplerConfig(height=30, width=26, psx=4, psy=3, s_row=3, s_col=5)
    sums = np.asarray(_strided_sum_map(x, cfg))
    assert sums.shape == (cfg.row_limit, cfg.col_limit)
    for ll, up in [(0, 0), (3, 2), (cfg.row_limit - 1, cfg.col_limit - 1)]:
        want = float(
            np.sum(np.asarray(strided_patch(x, ll, up, 4, 3, 3, 5)))
        )
        np.testing.assert_allclose(sums[ll, up], want, rtol=1e-5)


def test_uniform_valid_origin_distribution():
    """The k-th-valid draw is uniform over the True entries — the same
    distribution as the reference's redraw-until-valid loop."""
    from sinnerf_tpu.data.sampler import _uniform_valid_origin
    import jax.numpy as jnp

    valid = np.zeros((5, 7), bool)
    chosen = [(0, 1), (2, 3), (4, 6), (1, 0)]
    for r, c in chosen:
        valid[r, c] = True
    valid_j = jnp.asarray(valid)
    counts = {rc: 0 for rc in chosen}
    key = jax.random.key(0)
    n = 2000
    keys = jax.random.split(key, n)
    lls, ups = jax.vmap(
        lambda k: _uniform_valid_origin(k, valid_j, 7)
    )(keys)
    for ll, up in zip(np.asarray(lls), np.asarray(ups)):
        counts[(int(ll), int(up))] += 1  # KeyError if an invalid origin drawn
    for rc in chosen:  # ~500 each; 5 sigma ~ +-110
        assert abs(counts[rc] - n / 4) < 150, counts


def test_fresh_warp_patch_matches_full_forward_warp(blender_root):
    """The sampler's patch-only winner gather must reproduce exactly the
    strided patch of the full-image forward_warp (which it replaced to avoid
    materializing H*W warped RGB per step)."""
    import jax.numpy as jnp

    from sinnerf_tpu.data import jnp_poses
    from sinnerf_tpu.data.sampler import strided_patch
    from sinnerf_tpu.ops.warp import forward_warp, warp_winner

    ds = dataset_dict["blender_ray_patch_1image_rot3d"](
        blender_root, split="train", img_wh=(64, 64), patch_size=PSX,
        sW=2, sH=2, ref_idx=0, num_rays=NUM_RAYS,
    )
    scene = ds.scene
    cfg = ds.cfg
    xyz_deg = np.array([7.0, -4.0, 2.0], np.float32)
    pseudo_c2w = jnp_poses.rotate_3d(scene["ref_c2w"], *xyz_deg)
    ref_p = jnp_poses.projection_matrix(
        scene["k3"], jnp_poses.c2w_to_w2c_cv(scene["ref_c2w"])
    )
    src_p = jnp_poses.projection_matrix(
        scene["k3"], jnp_poses.c2w_to_w2c_cv(pseudo_c2w)
    )
    full_rgb, full_depth = forward_warp(
        scene["ref_image"], scene["ref_depth"], ref_p, src_p, zbuffer=False
    )
    h, w = scene["ref_depth"].shape
    win, d_flat = warp_winner(
        scene["ref_depth"], ref_p, src_p, zbuffer=False
    )
    win_map = win.reshape(h, w)
    depth_map = jnp.where(
        win >= 0, d_flat[jnp.maximum(win, 0)], 0.0
    ).reshape(h, w)
    np.testing.assert_array_equal(np.asarray(depth_map), np.asarray(full_depth))
    for ll, up in [(0, 0), (5, 9), (cfg.row_limit - 1, cfg.col_limit - 1)]:
        args = (ll, up, cfg.psx, cfg.psy, cfg.s_row, cfg.s_col)
        win_p = strided_patch(win_map, *args)
        wp = jnp.where(
            (win_p >= 0)[..., None],
            scene["ref_image"].reshape(-1, 3)[jnp.maximum(win_p, 0)],
            0.0,
        )
        np.testing.assert_array_equal(
            np.asarray(wp), np.asarray(strided_patch(full_rgb, *args))
        )


def test_sampler_rejects_missing_real_origins():
    """reject_real_patch without precomputed scene['real_origins'] must fail
    loudly at trace time, not silently fall back to unrejected origins."""
    import jax
    import jax.numpy as jnp

    from sinnerf_tpu.data.sampler import SamplerConfig, sample_item

    cfg = SamplerConfig(
        height=32, width=32, psx=4, psy=4, reject_real_patch="max_nonzero"
    )
    with pytest.raises(ValueError, match="real_origins"):
        sample_item(
            {"ref_image": jnp.zeros((32, 32, 3))},
            jax.random.PRNGKey(0),
            0,
            cfg,
        )


@pytest.fixture(scope="module")
def rich_blender_root(tmp_path_factory):
    from sinnerf_tpu.data.synthetic import make_blender_scene_rich

    # dir name contains 'lego' so the loader takes the my_testset branch
    # (REF_IDX 20, mytest val slice) exactly as for the real lego scene
    root = str(tmp_path_factory.mktemp("rich") / "lego")
    return make_blender_scene_rich(root, img_wh=(100, 100))


def test_rich_blender_scene_multiview_consistent(rich_blender_root):
    """Warping the reference view into nearby mytest poses must agree with
    the tracer's own render of those poses on warp-valid pixels — the
    property that makes the lego-recipe soak's novel-view val PSNR
    meaningful."""
    import jax.numpy as jnp

    from sinnerf_tpu.data import poses as P
    from sinnerf_tpu.data.base import load_image
    from sinnerf_tpu.data.blender import BlenderRot3D
    from sinnerf_tpu.ops.warp import forward_warp

    ds = BlenderRot3D(
        rich_blender_root, split="train", img_wh=(100, 100),
        patch_size=32, sW=2, sH=2,
    )
    assert ds.ref_idx == 20  # the REF_IDX table entry for lego
    ref_img = np.asarray(ds.scene["ref_image"])
    ref_depth = np.asarray(ds.scene["ref_depth"])
    ref_p = P.projection_matrix(
        ds.k3, P.convert_c2w_to_w2c_cv(np.asarray(ds.ref_c2w))
    )

    import json as _json

    with open(f"{rich_blender_root}/transforms_mytest.json") as f:
        meta = _json.load(f)
    # thresholds: the blender warp is last-write nearest-splat (no z-buffer,
    # blender_rot3d.py:148-149), so warps of the textured spheres carry
    # intrinsic resampling noise (15.3-19.5 dB measured on CPU).  mytest 30
    # coincides exactly with the ref pose and is deliberately skipped: the
    # identity projection lands on pixel centers where floor() is knife-edge
    # and backend-dependent (CPU vs TPU differ by 6 dB there)
    for i, floor in ((26, 14.0), (29, 15.0), (31, 15.0), (34, 14.0)):
        frame = meta["frames"][i]
        c2w = np.array(frame["transform_matrix"], dtype=np.float64)
        src_p = P.projection_matrix(ds.k3, P.convert_c2w_to_w2c_cv(c2w))
        warped, wd = forward_warp(
            jnp.asarray(ref_img), jnp.asarray(ref_depth),
            jnp.asarray(ref_p), jnp.asarray(src_p), zbuffer=False,
        )
        true = load_image(
            f"{rich_blender_root}/{frame['file_path']}.png",
            (100, 100), blend_alpha_to_white=True,
        )
        valid = np.asarray(wd) > 0
        assert valid.mean() > 0.15, f"mytest {i}: warp coverage too low"
        err = ((np.asarray(warped) - true) ** 2)[valid].mean()
        psnr = -10 * np.log10(err)
        assert psnr > floor, f"mytest {i}: warp vs true render {psnr:.1f} dB"
    hits = ref_depth[ref_depth > 0]
    assert hits.min() > 2.0 and hits.max() < 6.0  # inside blender NEAR/FAR


def test_rich_blender_val_split_is_true_novel_views(rich_blender_root):
    """The mytest val frames are real renders of each pose (not copies of
    the ref image), so val PSNR measures novel-view quality."""
    from sinnerf_tpu.data.blender import BlenderRot3D

    ds = BlenderRot3D(rich_blender_root, split="val", img_wh=(100, 100))
    assert ds.length == 40  # frames[30-20 : 30+20]
    a = np.asarray(ds.val_rgbs[0])
    b = np.asarray(ds.val_rgbs[-1])
    assert float(np.abs(a - b).mean()) > 0.01  # genuinely different views


@pytest.mark.parametrize(
    "psx,psy,sr,sc,h,w",
    [(64, 64, 6, 6, 400, 400), (63, 84, 4, 4, 378, 504), (5, 3, 2, 7, 40, 48),
     (1, 1, 1, 1, 8, 8), (7, 1, 3, 2, 30, 20)],
)
def test_strided_sum_map_matches_brute_force(psx, psy, sr, sc, h, w):
    """The O(log) doubling accumulation equals the direct per-origin patch
    sum (within f32) at recipe and degenerate shapes."""
    import jax.numpy as jnp

    from sinnerf_tpu.data.sampler import SamplerConfig, _strided_sum_map

    cfg = SamplerConfig(height=h, width=w, psx=psx, psy=psy, s_row=sr, s_col=sc)
    rng = np.random.default_rng(1)
    x = rng.random((h, w)).astype(np.float32)
    got = np.asarray(_strided_sum_map(jnp.asarray(x), cfg))
    want = np.zeros((cfg.row_limit, cfg.col_limit), np.float64)
    for i in range(psx):
        for j in range(psy):
            want += x[i * sr : i * sr + cfg.row_limit, j * sc : j * sc + cfg.col_limit]
    np.testing.assert_allclose(got, want, rtol=2e-6)


def test_blender_val_angle64_negative_slice_quirk(rich_blender_root):
    """eval.py's default --angle 64 makes the mytest val slice
    frames[30-64 : 30+64] == frames[-34:94], which Python resolves to the
    LAST 34 frames — the reference's exact (quirky) behavior
    (blender_rot3d.py:169-197 with eval.py:59's default)."""
    from sinnerf_tpu.data.blender import BlenderRot3D

    ds = BlenderRot3D(
        rich_blender_root, split="val", img_wh=(100, 100), angle=64
    )
    assert ds.length == 34


def test_sampler_prefetch_bit_identical(blender_root):
    """sample_many (K steps in one vmapped dispatch, the --prefetch_batches
    fast path) slices bit-identically to per-step sample() on the exact keys
    the per-step chain would draw — on the fresh-warp rot3d family, whose
    scatter/rejection path is the one being amortized."""
    ds = dataset_dict["blender_ray_patch_1image_rot3d"](
        blender_root, split="train", img_wh=(64, 64), patch_size=PSX,
        sW=2, sH=2, num_rays=NUM_RAYS, with_ref=True, load_depth=True,
        depth_type="nerf", ref_idx=0,
    )
    import jax.numpy as jnp

    key = jax.random.key(42)
    kb = []
    for _ in range(3):
        key, k_batch, _ = jax.random.split(key, 3)
        kb.append(k_batch)
    many = ds.sample_many(jnp.stack(kb), 7 + np.arange(3), batch_size=2)
    for j in range(3):
        single = ds.sample(kb[j], step=7 + j, batch_size=2)
        for name in single:
            if name == "warp_patch_depth":
                # the K-batched compilation may reassociate the projection
                # matmul chain by <=1 ulp; winners are ordinal-based (exact)
                np.testing.assert_allclose(
                    np.asarray(many[name][j]), np.asarray(single[name]),
                    rtol=1e-6, atol=2e-6, err_msg=f"{name} step {j}",
                )
            else:
                np.testing.assert_array_equal(
                    np.asarray(many[name][j]), np.asarray(single[name]),
                    err_msg=f"{name} step {j}",
                )
