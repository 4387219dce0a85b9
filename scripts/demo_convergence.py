"""End-to-end convergence demo on a procedurally generated blender scene.

Runs the real training stack (jitted sampler + single-pass train step, Step-1
weights: depth 8 + smooth 0.5) for a few hundred steps at realistic render
settings and reports val PSNR before/after.  Works on TPU or CPU.

    python scripts/demo_convergence.py [--steps 300] [--img 128]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sinnerf_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--patch", type=int, default=32)
    ap.add_argument("--n_samples", type=int, default=64)
    ap.add_argument("--n_importance", type=int, default=64)
    ap.add_argument("--num_rays", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--mlp_impl", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--compute_dtype", default="bfloat16")
    args = ap.parse_args()

    from sinnerf_tpu.data.synthetic import make_blender_scene
    from sinnerf_tpu.train.loop import SinNeRFTrainer
    from sinnerf_tpu.train.step import train_step

    tmp = tempfile.mkdtemp(prefix="sinnerf_demo_")
    root = make_blender_scene(os.path.join(tmp, "scene"), (args.img, args.img))

    hparams = argparse.Namespace(
        root_dir=root,
        dataset_name="blender_ray_patch_1image_rot3d",
        img_wh=[args.img, args.img],
        spheric_poses=False,
        N_samples=args.n_samples,
        N_importance=args.n_importance,
        use_disp=False,
        perturb=1.0,
        noise_std=1.0,
        batch_size=1,
        chunk=32768,
        num_epochs=1,
        num_gpus=1,
        ckpt_path=None,
        prefixes_to_ignore=["loss"],
        optimizer="adam",
        lr=args.lr,
        momentum=0.9,
        weight_decay=0.0,
        lr_scheduler="steplr",
        warmup_multiplier=1.0,
        warmup_epochs=0,
        decay_step=[10**9],
        decay_gamma=0.5,
        poly_exp=0.9,
        exp_name="demo",
        with_ref=True,
        patch_size=args.patch,
        patch_size_x=-1,
        patch_size_y=-1,
        pt_model=None,
        model="sinnerf",
        repeat=1,
        nW=32,
        nH=32,
        sW=2,
        sH=2,
        dloss="hinge",
        load_depth=True,
        nerf_only=False,
        depth_type="nerf",
        dis_weight=0.0,
        proj_weight=1.0,
        angle=20,
        scan=4,
        depth_weight=8.0,
        vit_weight=0.0,
        depth_smooth_weight=0.5,
        depth_anneal=False,
        loss_type="mse",
        patch_loss="mse",
        compute_dtype=args.compute_dtype,
        mlp_impl=args.mlp_impl,
        vit_weights=None,
        vgg_weights=None,
        check_val_every_n_epoch=1,
        ckpt_dir=os.path.join(tmp, "ckpts"),
        log_dir=os.path.join(tmp, "logs"),
        seed=0,
        num_rays=args.num_rays,
        ref_idx=0,
    )

    print(f"backend: {jax.default_backend()}", flush=True)
    trainer = SinNeRFTrainer(hparams)
    psnr0 = trainer.validate(0, log=False)
    print(f"val PSNR before training: {psnr0:.2f} dB", flush=True)

    t_compile = time.time()
    losses = []
    for i in range(args.steps):
        trainer.key, kb, ks = jax.random.split(trainer.key, 3)
        batch = trainer.train_dataset.sample(kb, step=i, batch_size=1)
        trainer.state, out = train_step(
            trainer.state, batch, ks, jnp.asarray(0.0),
            trainer.cfg, trainer.opt_g, trainer.opt_d,
        )
        if i == 0:
            # force materialization to split compile from steady state
            float(out["metrics"]["train/loss"])
            t_steady = time.time()
            print(f"first step (compile): {t_steady - t_compile:.1f}s", flush=True)
        if (i + 1) % 50 == 0:
            loss = float(out["metrics"]["train/loss"])
            psnr = float(out["metrics"]["train/psnr"])
            losses.append(loss)
            print(f"step {i + 1}: loss={loss:.4f} train_psnr={psnr:.2f}", flush=True)
    dt = time.time() - t_steady
    print(f"throughput: {(args.steps - 1) / dt:.2f} steps/s", flush=True)

    psnr1 = trainer.validate(0, log=False)
    print(f"val PSNR after {args.steps} steps: {psnr1:.2f} dB (was {psnr0:.2f})", flush=True)
    assert psnr1 > psnr0 + 3, "training did not converge"
    print("CONVERGENCE OK", flush=True)


if __name__ == "__main__":
    main()
