"""End-to-end trainer-loop steps/s at the lego Step-1 recipe scale.

Unlike `bench.py` (synthetic batch, pure train_step) this runs the REAL
`SinNeRFTrainer._fit` path — jitted sampler, shard/dispatch, host step
bookkeeping, every-10-step tensorboard logging — so it measures exactly what
a soak run sees between validations.  The bench-vs-recipe gap lives here
(round 3: 8.28 bench vs ~7.7 end-to-end; sampler + blocking log fetches).

    python scripts/profile_loop.py [--epochs 3] [--step2]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sinnerf_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--img", type=int, default=400)
    ap.add_argument("--step2", action="store_true", help="enable GAN + ViT")
    ap.add_argument("--prefetch", type=int, default=None,
                    help="override --prefetch_batches (default: opt.py's)")
    args = ap.parse_args()

    from opt import make_default_hparams
    from sinnerf_tpu.data.synthetic import make_blender_scene
    from sinnerf_tpu.train.loop import SinNeRFTrainer

    tmp = tempfile.mkdtemp(prefix="sinnerf_loop_")
    root = make_blender_scene(os.path.join(tmp, "scene"), (args.img, args.img))
    extra = (
        dict(dis_weight=2e-3, vit_weight=10.0, allow_random_pretrained=True)
        if args.step2
        else {}
    )
    hparams = make_default_hparams(
        root_dir=root, dataset_name="blender_ray_patch_1image_rot3d",
        img_wh=[args.img, args.img], batch_size=1, num_epochs=args.epochs,
        num_gpus=1, lr=5e-4, decay_step=[500], decay_gamma=0.5,
        exp_name="profile_loop", with_ref=True, patch_size=64, sW=6, sH=6,
        load_depth=True, model="sinnerf", depth_weight=8.0,
        depth_smooth_weight=0.5, compute_dtype="bfloat16", mlp_impl="pallas",
        check_val_every_n_epoch=10**9, ckpt_dir=os.path.join(tmp, "ck"),
        log_dir=os.path.join(tmp, "lg"), num_rays=4096, ref_idx=0, **extra,
    )
    if args.prefetch is not None:
        hparams.prefetch_batches = args.prefetch
    trainer = SinNeRFTrainer(hparams)
    spe = trainer.steps_per_epoch()
    # warm epoch compiles everything; later epochs are the measurement.
    # drain the dispatch queue per epoch so each timing is self-contained
    import jax

    host_step = 0
    times = []
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        host_step = trainer._run_epoch(epoch, spe, host_step)
        # block_until_ready does not synchronize over the axon tunnel; a
        # scalar fetch drains the dispatch queue
        float(jax.tree_util.tree_leaves(trainer.state.params)[0].sum())
        dt = time.perf_counter() - t0
        times.append(dt)
        print(
            f"epoch {epoch}: {dt:.2f}s  {spe / dt:.2f} steps/s"
            + ("  (warmup/compile)" if epoch == 0 else "")
        )
    if len(times) > 1:
        best = min(times[1:])
        print(f"steps/s (best steady epoch): {spe / best:.2f}")


if __name__ == "__main__":
    main()
