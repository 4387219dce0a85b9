"""Measure train_step throughput with the Step-2 extras on (ViT + GAN).

bench.py's train metric covers the Step-1 loss set (depth+side+smooth); the
published Step-2 recipe adds --vit_weight 10 --dis_weight 1e-4.  This script
times the full step with random-init ViT/D weights (throughput only — the
contents don't change the compiled program).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sinnerf_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax

import argparse

import jax.numpy as jnp
import numpy as np

from sinnerf_tpu.models.discriminator import init_discriminator
from sinnerf_tpu.models.nerf import init_nerf_params
from sinnerf_tpu.models.vit import load_vit_params
from sinnerf_tpu.render.renderer import RenderSettings
from sinnerf_tpu.train.optimizers import get_optimizer
from sinnerf_tpu.train.step import TrainConfig, TrainState, train_step

N_RAYS, PS = 4096, 64


def make_rays(n, rng):
    o = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near = np.full((n, 1), 2.0, np.float32)
    far = np.full((n, 1), 6.0, np.float32)
    return np.concatenate([o, d, near, far], axis=1).reshape(1, n, 8)


def main():
    rng = np.random.default_rng(0)

    def pos(*shape):
        return rng.uniform(2.0, 6.0, size=shape).astype(np.float32)

    batch = {
        "rays": make_rays(N_RAYS, rng),
        "rgbs": rng.uniform(size=(1, N_RAYS, 3)).astype(np.float32),
        "depth": pos(1, N_RAYS, 1),
        "rays_proj": make_rays(N_RAYS, rng),
        "depth_proj": pos(1, N_RAYS, 1),
        "real_patch": rng.uniform(size=(1, 3, PS, PS)).astype(np.float32),
        "rays_full": make_rays(PS * PS, rng),
        "warp_patch": rng.uniform(size=(1, 3, PS, PS)).astype(np.float32),
        "warp_patch_depth": (
            pos(1, PS * PS, 1) * (rng.uniform(size=(1, PS * PS, 1)) > 0.5)
        ).astype(np.float32),
        "depth_ray": make_rays(PS * PS, rng),
        "depth_gt": pos(1, PS * PS, 1),
        "depth_ray_rgb": rng.uniform(size=(1, PS * PS, 3)).astype(np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    settings = RenderSettings(
        n_samples=64, n_importance=128, perturb=1.0, noise_std=1.0,
        white_back=True, compute_dtype="bfloat16", mlp_impl="pallas",
    )
    cfg = TrainConfig(
        render=settings, depth_weight=8.0, proj_weight=1.0,
        depth_smooth_weight=0.5, vit_weight=10.0, dis_weight=1e-4,
        imsize=PS,
    )
    hp = argparse.Namespace(
        optimizer="adam", lr=5e-5, momentum=0.9, weight_decay=0.0,
        warmup_epochs=0, warmup_multiplier=1.0,
    )
    opt_g = get_optimizer(hp)
    opt_d = get_optimizer(hp, rate=0.2)
    params = {
        "coarse": init_nerf_params(jax.random.key(0)),
        "fine": init_nerf_params(jax.random.key(1)),
    }
    d_params, sn_state = init_discriminator(jax.random.key(2), imsize=PS)
    vit_params = load_vit_params(None)  # random weights: throughput only
    state = TrainState(
        params=params, opt_g=opt_g.init(params), d_params=d_params,
        sn_state=sn_state, opt_d=opt_d.init(d_params), vit_params=vit_params,
        ref_feature=jnp.zeros((1, 384)), vgg_params=None,
        step=jnp.zeros((), jnp.int32),
    )
    epoch = jnp.asarray(0.0)

    def run(state, iters):
        out = None
        for i in range(iters):
            state, out = train_step(
                state, batch, jax.random.key(i), epoch, cfg, opt_g, opt_d
            )
        float(out["metrics"]["train/loss"])
        return state

    state = run(state, 2)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        state = run(state, 20)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"step2 (vit+gan) train_step: {20 / best:.2f} steps/s ({best / 20 * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
