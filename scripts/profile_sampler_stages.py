"""Stage-level decomposition of the on-device batch sampler (lego recipe
scale, 400^2, fresh pseudo-view warp per step).

`profile_sampler.py` measures the whole jitted `sample_batch`; this script
times isolated jitted sub-stages so optimization effort lands where the
milliseconds are.  Each stage is timed with the chained-iteration trick from
`sinnerf_tpu/utils/profiling.py` (the axon tunnel's block_until_ready does
not synchronize; a loop-carried dependence + one scalar fetch does).

Stages:
  warp        fresh gaussian pseudo-view warp (project + collision + gather)
  winner      collision resolution alone (1-D ordinal scatter; no value gather)
  pools       random ref-ray pool draws + projected-ray assembly (steps 1-2)
  patches     patch origin rejection + all strided patch gathers (steps 3-6)
  full        the whole sample_batch for reference
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sinnerf_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import tempfile
from functools import partial

import jax
import jax.numpy as jnp

from opt import make_default_hparams
from sinnerf_tpu.data import jnp_poses
from sinnerf_tpu.data.synthetic import make_blender_scene
from sinnerf_tpu.ops.warp import forward_warp, warp_winner
from sinnerf_tpu.train.loop import SinNeRFTrainer

ITERS = 50


def main():
    tmp = tempfile.mkdtemp(prefix="sinnerf_sampler_stages_")
    root = make_blender_scene(os.path.join(tmp, "scene"), (400, 400))
    hparams = make_default_hparams(
        root_dir=root, dataset_name="blender_ray_patch_1image_rot3d",
        img_wh=[400, 400], batch_size=1, num_epochs=1, num_gpus=1, lr=5e-4,
        decay_step=[500], decay_gamma=0.5, exp_name="profile", with_ref=True,
        patch_size=64, sW=6, sH=6, load_depth=True, model="sinnerf",
        depth_weight=8.0, depth_smooth_weight=0.5, compute_dtype="bfloat16",
        mlp_impl="pallas", allow_random_pretrained=True,
        check_val_every_n_epoch=1, ckpt_dir=os.path.join(tmp, "ck"),
        log_dir=os.path.join(tmp, "lg"), num_rays=4096, ref_idx=0,
    )
    trainer = SinNeRFTrainer(hparams)
    ds = trainer.train_dataset
    scene = ds.scene
    cfg = ds.cfg

    key = jax.random.key(0)

    # ---- warp stage ---------------------------------------------------
    @jax.jit
    def warp_stage(k):
        std = cfg.angle // 2
        xyz_deg = jax.random.normal(k, (3,)) * std
        c2w = jnp_poses.rotate_3d(scene["ref_c2w"], *xyz_deg)
        ref_p = jnp_poses.projection_matrix(
            scene["k3"], jnp_poses.c2w_to_w2c_cv(scene["ref_c2w"])
        )
        src_p = jnp_poses.projection_matrix(
            scene["k3"], jnp_poses.c2w_to_w2c_cv(c2w)
        )
        rgb, d = forward_warp(
            scene["ref_image"], scene["ref_depth"], ref_p, src_p,
            zbuffer=False,
        )
        return rgb.sum() + d.sum()

    @jax.jit
    def winner_stage(k):
        std = cfg.angle // 2
        xyz_deg = jax.random.normal(k, (3,)) * std
        c2w = jnp_poses.rotate_3d(scene["ref_c2w"], *xyz_deg)
        ref_p = jnp_poses.projection_matrix(
            scene["k3"], jnp_poses.c2w_to_w2c_cv(scene["ref_c2w"])
        )
        src_p = jnp_poses.projection_matrix(
            scene["k3"], jnp_poses.c2w_to_w2c_cv(c2w)
        )
        win, d = warp_winner(
            scene["ref_depth"], ref_p, src_p, zbuffer=False
        )
        return win.sum() + d.sum()

    # ---- pool draws (sampler steps 1-2) --------------------------------
    @jax.jit
    def pools_stage(k):
        k0, k1, k2 = jax.random.split(k, 3)
        n_main = cfg.num_rays - cfg.n_any
        i_main = jax.random.randint(
            k0, (n_main,), 0, scene["pool"].shape[0]
        )
        acc = scene["pool"][i_main].sum()
        if cfg.n_any > 0:
            i_any = jax.random.randint(
                k1, (cfg.n_any,), 0, scene["any"].shape[0]
            )
            acc += scene["any"][i_any].sum()
        j = jax.random.randint(
            k2, (cfg.num_rays,), 0, scene["proj_depth"].shape[0]
        )
        dirs = scene["directions"].reshape(-1, 3)[scene["proj_pix"][j]]
        c2ws = scene["bank_c2w"][scene["proj_pose"][j]]
        rays_d = jnp.einsum("nj,nij->ni", dirs, c2ws[:, :, :3])
        return acc + rays_d.sum() + scene["proj_depth"][j].sum()

    # ---- patch picks + strided gathers (steps 3, 5, 6) -----------------
    from sinnerf_tpu.data.sampler import (
        _strided_sum_map,
        _uniform_valid_origin,
        strided_patch,
    )

    @jax.jit
    def patches_stage(k):
        k3, k5 = jax.random.split(k)

        i_o = jax.random.randint(k3, (), 0, scene["real_origins"].shape[0])
        code = scene["real_origins"][i_o]
        ll_r, up_r = code // cfg.col_limit, code % cfg.col_limit
        acc = strided_patch(
            scene["ref_image"], ll_r, up_r, cfg.psx, cfg.psy,
            cfg.s_row, cfg.s_col,
        ).sum()

        sums = _strided_sum_map(scene["ref_depth"], cfg)
        ll, up = _uniform_valid_origin(k5, sums != 0, cfg.col_limit)
        args = (ll, up, cfg.psx, cfg.psy, cfg.s_row, cfg.s_col)
        acc += strided_patch(scene["ref_depth"], *args).sum()
        acc += strided_patch(scene["ref_image"], *args).sum()
        acc += strided_patch(scene["directions"], *args).sum()
        return acc

    # ---- channel-major bank patch (the LLFF/DTU/proj bank path) --------
    # banks live as (P, 3, H, W) so the patch gather runs over the minor
    # (sublane/lane) axes — measure it, since lane gathers can lower badly
    h, w = cfg.height, cfg.width
    bank_cm = jax.random.normal(jax.random.key(9), (10, 3, h, w), jnp.float32)

    @jax.jit
    def bankpatch_stage(k):
        kb, k5 = jax.random.split(k)
        bank_i = jax.random.randint(kb, (), 0, bank_cm.shape[0])
        warp_rgb = bank_cm[bank_i]

        kl, ku = jax.random.split(k5)
        ll = jax.random.randint(kl, (), 0, cfg.row_limit)
        up = jax.random.randint(ku, (), 0, cfg.col_limit)
        from sinnerf_tpu.data.sampler import strided_patch_cm

        return strided_patch_cm(
            warp_rgb, ll, up, cfg.psx, cfg.psy, cfg.s_row, cfg.s_col
        ).sum()

    @jax.jit
    def full_stage(k):
        b = ds.sample(k, step=0, batch_size=1)
        return sum(v.sum() for v in jax.tree_util.tree_leaves(b))

    for name, fn in [
        ("winner", winner_stage),
        ("warp", warp_stage),
        ("pools", pools_stage),
        ("patches", patches_stage),
        ("bankpatch", bankpatch_stage),
        ("full", full_stage),
    ]:
        # key-chained timing: thread the scalar into the next key so the
        # iterations form one dependent on-device chain
        def chained(k0, fn=fn):
            def body(i, carry):
                k, acc = carry
                k = jax.random.fold_in(k, i)
                return (k, acc + fn(k) * 1e-30)

            _, acc = jax.lax.fori_loop(0, ITERS, body, (k0, jnp.zeros(())))
            return acc

        run = jax.jit(chained)
        float(run(key))  # compile + warm
        t0 = time.perf_counter()
        float(run(key))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:>8}: {dt * 1e3:7.3f} ms/step")


if __name__ == "__main__":
    main()
