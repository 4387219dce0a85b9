"""Per-step cost of the on-device batch sampler at the lego recipe scale.

The bench train_step (synthetic batch) runs at 8.28 steps/s while
demo_convergence (real sampling + logging) measured 7.69 — find how much of
the ~9ms/step gap is the jitted sampler (fresh pseudo-view warp per step).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sinnerf_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import argparse
import tempfile

import jax
import jax.numpy as jnp

from sinnerf_tpu.data.synthetic import make_blender_scene
from sinnerf_tpu.train.loop import SinNeRFTrainer


def main():
    tmp = tempfile.mkdtemp(prefix="sinnerf_sampler_")
    root = make_blender_scene(os.path.join(tmp, "scene"), (400, 400))
    hparams = argparse.Namespace(
        root_dir=root, dataset_name="blender_ray_patch_1image_rot3d",
        img_wh=[400, 400], spheric_poses=False, N_samples=64, N_importance=128,
        use_disp=False, perturb=1.0, noise_std=1.0, batch_size=1, chunk=32768,
        num_epochs=1, num_gpus=1, ckpt_path=None, prefixes_to_ignore=["loss"],
        optimizer="adam", lr=5e-4, momentum=0.9, weight_decay=0.0,
        lr_scheduler="steplr", warmup_multiplier=1.0, warmup_epochs=0,
        decay_step=[500], decay_gamma=0.5, poly_exp=0.9, exp_name="profile",
        with_ref=True, patch_size=64, patch_size_x=-1, patch_size_y=-1,
        pt_model=None, model="sinnerf", repeat=1, nW=32, nH=32, sW=6, sH=6,
        dloss="hinge", load_depth=True, nerf_only=False, depth_type="nerf",
        dis_weight=0.0, proj_weight=1.0, angle=20, scan=4, depth_weight=8.0,
        vit_weight=0.0, depth_smooth_weight=0.5, depth_anneal=False,
        loss_type="mse", patch_loss="mse", compute_dtype="bfloat16",
        mlp_impl="pallas", vit_weights=None, vgg_weights=None,
        allow_random_pretrained=True, check_val_every_n_epoch=1,
        ckpt_dir=os.path.join(tmp, "ck"), log_dir=os.path.join(tmp, "lg"),
        seed=0, num_rays=4096, ref_idx=0,
    )
    trainer = SinNeRFTrainer(hparams)
    ds = trainer.train_dataset

    # chained timing: batch i+1's key depends on batch i's content
    def run(iters):
        key = jax.random.key(0)
        acc = jnp.zeros(())
        b = None
        for i in range(iters):
            key, k = jax.random.split(key)
            b = ds.sample(k, step=i, batch_size=1)
            acc = acc + b["rays"].sum() * 1e-30
        float(acc + b["rays"].sum())
        return None

    run(2)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        run(30)
        dt = (time.perf_counter() - t0) / 30
        best = dt if best is None else min(best, dt)
    print(f"sampler: {best * 1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
