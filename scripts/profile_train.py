"""Decompose train-step time at the lego Step-1 shape (16,384 rays x 64+192).

Times, via the chained on-device harness (utils/profiling.time_fn):
  1. fused MLP forward kernel alone, coarse (1.05M pts) + fine (3.15M pts)
  2. fused MLP forward+backward (VJP) at the same shapes
  3. full stochastic render_rays forward
  4. value_and_grad of a dummy loss through render_rays
  5. (reference) the full train_step number comes from bench.py

Run serially on the TPU (one axon tunnel process).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sinnerf_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax

import jax.numpy as jnp
import numpy as np

from sinnerf_tpu.models.nerf import init_nerf_params
from sinnerf_tpu.ops.fused_mlp_t import fused_nerf_mlp_t
from sinnerf_tpu.render.renderer import RenderSettings, render_rays
from sinnerf_tpu.utils.profiling import time_fn

N_RAYS = 16384
S_COARSE = 64
S_FINE = 192
CDTYPE = "bfloat16"


def main():
    rng = np.random.default_rng(0)
    params = {
        "coarse": init_nerf_params(jax.random.key(0)),
        "fine": init_nerf_params(jax.random.key(1)),
    }

    report = {}

    for tag, n_pts in (("coarse", N_RAYS * S_COARSE), ("fine", N_RAYS * S_FINE)):
        xyz = jnp.asarray(rng.normal(size=(3, n_pts)).astype(np.float32))
        dirs = jnp.asarray(rng.normal(size=(3, n_pts)).astype(np.float32))

        def fwd(x, d, p):
            return fused_nerf_mlp_t(p, x, d, False, True, CDTYPE)

        dt = time_fn(lambda x: fwd(x, dirs, params["coarse"]), xyz, iters=30)
        report[f"mlp_fwd_{tag}"] = dt

        def loss(x, d, p):
            return jnp.sum(fused_nerf_mlp_t(p, x, d, False, True, CDTYPE))

        g = jax.grad(loss, argnums=(0, 2))

        def fwd_bwd(x):
            dx, dp = g(x, dirs, params["coarse"])
            return dx.sum() + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(dp))

        dt = time_fn(fwd_bwd, xyz, iters=30)
        report[f"mlp_fwdbwd_{tag}"] = dt

    # full stochastic render (train-mode settings)
    o = rng.normal(size=(N_RAYS, 3)).astype(np.float32)
    d = rng.normal(size=(N_RAYS, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(
        np.concatenate(
            [o, d, np.full((N_RAYS, 1), 2.0, np.float32), np.full((N_RAYS, 1), 6.0, np.float32)],
            axis=1,
        )
    )
    settings = RenderSettings(
        n_samples=S_COARSE, n_importance=S_FINE - S_COARSE, perturb=1.0,
        noise_std=1.0, white_back=True, compute_dtype=CDTYPE, mlp_impl="pallas",
    )
    key = jax.random.key(3)

    def render_fwd(r):
        out = render_rays(params, r, key, settings)
        return out["rgb_fine"].sum() + out["rgb_coarse"].sum() + out["depth_fine"].sum()

    report["render_fwd"] = time_fn(render_fwd, rays, iters=20)

    def render_loss(p, r):
        out = render_rays(p, r, key, settings)
        return (
            jnp.sum(out["rgb_fine"] ** 2)
            + jnp.sum(out["rgb_coarse"] ** 2)
            + jnp.sum(out["depth_fine"] ** 2)
        )

    gfn = jax.grad(render_loss)

    def render_fwdbwd(r):
        dp = gfn(params, r)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(dp))

    report["render_fwdbwd"] = time_fn(render_fwdbwd, rays, iters=20)

    for k, v in report.items():
        print(f"{k:24s} {v * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
