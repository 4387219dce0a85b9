"""Per-step cost of the on-device batch sampler at the lego recipe scale.

The bench train_step (synthetic batch) runs at 8.28 steps/s while
demo_convergence (real sampling + logging) measured ~7.7 — find how much of
the gap is the jitted sampler (fresh pseudo-view warp per step).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sinnerf_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import tempfile

import jax
import jax.numpy as jnp

from opt import make_default_hparams
from sinnerf_tpu.data.synthetic import make_blender_scene
from sinnerf_tpu.train.loop import SinNeRFTrainer

ITERS = 100


def main():
    tmp = tempfile.mkdtemp(prefix="sinnerf_sampler_")
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

    # The per-iteration sample() dispatches queue serially on the one device
    # stream; the trailing scalar fetch drains the whole queue (the axon
    # tunnel's block_until_ready does not synchronize).  The ~30ms fetch RTT
    # amortizes over ITERS=100 -> <0.3ms bias on the per-step figure.
    def run(iters):
        key = jax.random.key(0)
        acc = jnp.zeros(())
        b = None
        for i in range(iters):
            key, k = jax.random.split(key)
            b = ds.sample(k, step=i, batch_size=1)
            acc = acc + b["rays"].sum() * 1e-30
        float(acc + b["rays"].sum())

    run(2)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        run(ITERS)
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    print(f"sampler: {best * 1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
