"""Component breakdown of the render hot path on the real TPU.

Times each stage of the coarse+fine pipeline at the bench shape
(65536 rays x 64 coarse + 64 importance) with the loop-carried fori timing
harness (the axon tunnel's block_until_ready does not synchronize).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sinnerf_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax

import jax.numpy as jnp
import numpy as np

from sinnerf_tpu.core.composite import composite_t
from sinnerf_tpu.core.encoding import positional_encoding_blocked_t
from sinnerf_tpu.core.sampling import sample_pdf, stratified_z_vals
from sinnerf_tpu.models.nerf import init_nerf_params
from sinnerf_tpu.ops.fused_mlp_t import fused_nerf_mlp_t
from sinnerf_tpu.render.renderer import RenderSettings, render_rays
from sinnerf_tpu.utils.profiling import time_fn

N = 65536
NS, NI = 64, 64
DTYPE = "bfloat16"


def make_rays(n):
    rng = np.random.default_rng(0)
    o = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(
        np.concatenate(
            [o, d, np.full((n, 1), 2.0, np.float32), np.full((n, 1), 6.0, np.float32)],
            axis=1,
        )
    )


def main():
    params = {
        "coarse": init_nerf_params(jax.random.key(0)),
        "fine": init_nerf_params(jax.random.key(1)),
    }
    rays = make_rays(N)
    rng = np.random.default_rng(1)

    rows = []

    # full render (pallas, bf16) — the bench configuration
    s = RenderSettings(n_samples=NS, n_importance=NI, perturb=0.0, noise_std=0.0,
                       compute_dtype=DTYPE, mlp_impl="pallas")
    dt = time_fn(lambda r: render_rays(params, r, None, s)["rgb_fine"], rays, iters=10)
    rows.append(("full render (pallas bf16)", dt))
    total = dt

    # coarse-only render (n_importance=0) — isolates the fine half
    s0 = RenderSettings(n_samples=NS, n_importance=0, perturb=0.0, noise_std=0.0,
                        compute_dtype=DTYPE, mlp_impl="pallas")
    dt = time_fn(lambda r: render_rays(params, r, None, s0)["rgb_fine"], rays, iters=10)
    rows.append(("coarse-only render", dt))

    # fused PE+MLP kernel alone (PE runs in-kernel from raw (3, N) inputs)
    xyz_c = jnp.asarray(rng.normal(size=(3, N * NS)).astype(np.float32))
    dir_c = jnp.asarray(rng.normal(size=(3, N * NS)).astype(np.float32))

    def pe_mlp(x, d):
        return fused_nerf_mlp_t(params["coarse"], x, d, False, True, DTYPE)

    dt = time_fn(pe_mlp, xyz_c, dir_c, iters=10)
    rows.append((f"PE+MLP {N*NS/1e6:.1f}M pts (coarse)", dt))

    xyz_f = jnp.asarray(rng.normal(size=(3, N * (NS + NI))).astype(np.float32))
    dir_f = jnp.asarray(rng.normal(size=(3, N * (NS + NI))).astype(np.float32))
    dt = time_fn(pe_mlp, xyz_f, dir_f, iters=10)
    rows.append((f"PE+MLP {N*(NS+NI)/1e6:.1f}M pts (fine)", dt))

    # PE alone at fine size
    def pe_only(x):
        return positional_encoding_blocked_t(x, 10, out_dtype=jnp.bfloat16)

    dt = time_fn(pe_only, xyz_f, iters=10)
    rows.append(("PE alone (8.4M pts, 63ch)", dt))

    # sample_pdf at render shape: bins (N, 63), weights (N, 62), 64 draws
    z_vals = stratified_z_vals(rays[:, 6:7], rays[:, 7:8], NS)
    z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
    w = jnp.asarray(rng.uniform(0.0, 1.0, size=(N, NS - 2)).astype(np.float32))
    dt = time_fn(
        lambda wt: sample_pdf(z_mid, wt, NI, det=True, sorted_u=True), w, iters=10
    )
    rows.append(("sample_pdf (det)", dt))

    # the z merge sort (N, 128)
    zcat = jnp.concatenate([z_vals, z_vals + 0.37], axis=-1)
    dt = time_fn(lambda z: jnp.sort(z, axis=-1), zcat, iters=10)
    rows.append(("jnp.sort merge (N,128)", dt))

    # compositing at fine size
    rgbs_t = jnp.asarray(rng.uniform(size=(3, N, NS + NI)).astype(np.float32))
    sig = jnp.asarray(rng.normal(size=(N, NS + NI)).astype(np.float32))
    zf = jnp.concatenate([z_vals, z_vals + 0.01], axis=-1)
    rd = rays[:, 3:6]
    dt = time_fn(
        lambda s_: composite_t(rgbs_t, s_, zf, rd).rgb, sig, iters=10
    )
    rows.append(("composite_t (fine size)", dt))

    print(f"{'stage':38s} {'ms':>8s} {'% of full':>9s}")
    for name, dt in rows:
        print(f"{name:38s} {dt*1e3:8.2f} {dt/total*100:8.1f}%")
    spr = NS + NS + NI
    print(f"\nfull render: {N*spr/total/1e6:.1f}M ray-samples/s")


if __name__ == "__main__":
    main()
