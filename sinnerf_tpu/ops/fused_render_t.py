"""Fused per-ray render kernel: PE + MLP + online alpha-compositing in VMEM.

The gradient-free render path (validation, eval.py, the coarse/fine passes of
``render_rays`` in eval mode) previously ran three XLA stages around the
per-point MLP kernel: materialize (8, N_pts) rgb+sigma to HBM, read it back
for compositing, and scan the transmittance cumprod over HBM-resident
(N, S) arrays.  This kernel restructures the grid from *points* to *rays*:
each grid step owns a tile of ``R_TILE`` rays, loops over the S samples with
a ``fori_loop``, evaluates the 13-layer MLP per sample step (matmuls stay
MXU-sized: (256, 256) @ (256, R_TILE)), and composites online into vector
registers — transmittance, rgb, depth, and weight-sum never touch HBM.  The
direction PE is also hoisted: computed once per ray instead of once per
sample (the per-point layout recomputes it S times).

Compositing semantics match ``core/composite.py`` exactly (deltas with the
1e10 far cap scaled by the unnormalized ||d||, alpha = 1 - exp(-delta *
relu(sigma)), exclusive cumprod with the +1e-10 guard, optional white
background), which in turn is the reference ``models/rendering.py:214-248``.

The kernel itself computes no gradients, but the wrapper is fully
differentiable: its custom VJP recomputes through the unfused per-point
composition (``fused_mlp_t`` + ``composite_t``), so parameter AND ray/depth
gradients are exact — a deterministic render that IS differentiated costs
one extra forward.  (Stochastic training uses the dedicated per-ray train
kernels in ``fused_render_train_t.py`` instead.)  Inputs are the packed
rays and the per-ray sample depths; z generation / importance resampling
stay outside (they are cheap and RNG-bearing).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sinnerf_tpu.ops.fused_mlp_t import (
    DIR_CH,
    DIR_PAD,
    N_FREQS_DIR,
    N_FREQS_XYZ,
    XYZ_CH,
    XYZ_PAD,
    _pe_concat,
    _pe_fwd,
    mlp_from_pe,
    pack_weights_t,
)

import os

RAY_OUT = 8  # output rows: rgb 0:3, depth 3, weight-sum 4, 5:8 zero
# rays per grid step; swept on v5e at the eval bench shape:
# 1024 -> 128.6M, 2048 -> 130.6M, 4096 -> 131.4M samples/s
R_TILE = int(os.environ.get("SINNERF_R_TILE", "4096"))


def _render_kernel(
    rays_ref,  # (8, R) f32: o 0:3, d 3:6
    z_ref,     # (S, R) f32 per-ray sample depths (ascending)
    *refs,
    n_samples: int,
    use_new_activation: bool,
    white_back: bool,
    cdtype: str,
):
    weight_refs = refs[:26]
    out_ref, w_ref = refs[26], refs[27]

    cd = jnp.bfloat16 if cdtype == "bfloat16" else jnp.float32
    r = rays_ref.shape[1]
    rays = rays_ref[:]
    o3 = rays[0:3]
    d3 = rays[3:6]
    dnorm = jnp.sqrt(jnp.sum(d3 * d3, axis=0, keepdims=True))  # (1, R)

    # direction PE once per ray (the per-point layout recomputes it S times)
    sd, cdir = _pe_fwd(d3, N_FREQS_DIR)
    d_pe = _pe_concat(d3, sd, cdir, DIR_PAD - DIR_CH, cd)  # (32, R)

    def body(s, carry):
        rgb_acc, depth_acc, wsum, trans = carry
        z_s = z_ref[pl.ds(s, 1), :]  # (1, R)
        # delta_s = z_{s+1} - z_s, with a 1e10 cap on the last interval
        # (rendering.py:218-222); clamped read keeps the index in bounds
        s_next = jnp.minimum(s + 1, n_samples - 1)
        z_next = z_ref[pl.ds(s_next, 1), :]
        delta = jnp.where(s == n_samples - 1, 1e10, z_next - z_s) * dnorm

        xyz = o3 + d3 * z_s  # (3, R)
        sx, cx = _pe_fwd(xyz, N_FREQS_XYZ)
        x_pe = _pe_concat(xyz, sx, cx, XYZ_PAD - XYZ_CH, cd)
        rgb8, sig8 = mlp_from_pe(weight_refs, x_pe, d_pe, use_new_activation, False)

        alpha = 1.0 - jnp.exp(-delta * jax.nn.relu(sig8[0:1]))  # (1, R)
        w = alpha * trans
        w_ref[pl.ds(s, 1), :] = w.astype(w_ref.dtype)
        return (
            rgb_acc + w * rgb8[0:3],
            depth_acc + w * z_s,
            wsum + w,
            trans * (1.0 - alpha + 1e-10),
        )

    init = (
        jnp.zeros((3, r), jnp.float32),
        jnp.zeros((1, r), jnp.float32),
        jnp.zeros((1, r), jnp.float32),
        jnp.ones((1, r), jnp.float32),
    )
    rgb_acc, depth_acc, wsum, _ = jax.lax.fori_loop(0, n_samples, body, init)
    if white_back:
        rgb_acc = rgb_acc + (1.0 - wsum)  # rendering.py:245-246
    out_ref[:] = jnp.concatenate(
        [rgb_acc, depth_acc, wsum, jnp.zeros((RAY_OUT - 5, r), jnp.float32)],
        axis=0,
    ).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_render_level(
    params: Dict[str, Any],
    rays_t: jnp.ndarray,  # (>=6, N) f32: o 0:3, d 3:6 (unnormalized)
    z_vals: jnp.ndarray,  # (N, S) f32 ascending sample depths
    use_new_activation: bool = True,
    white_back: bool = False,
    compute_dtype: str = "float32",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Render one level (coarse or fine) of a ray batch in a single kernel.

    Returns (rgb (N, 3), depth (N,), weights (N, S)) with the exact
    semantics of ``composite_t(mlp(...))``.

    Differentiable via custom VJP: the backward pass recomputes through the
    unfused composition (per-point kernel + ``composite_t``), so gradients
    through a deterministic render cost one extra forward — the common case
    (validation/eval) never differentiates and stays single-kernel.
    """
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    n, s = z_vals.shape
    # clamp the tile to the 512-rounded ray count: tiny renders (tests,
    # sub-tile val tiles) would otherwise pad to a full R_TILE of dummy rays
    r_tile = min(R_TILE, -(-n // 512) * 512)
    n_pad = (-n) % r_tile
    rays8 = rays_t[0:6]
    rays8 = jnp.concatenate(
        [rays8, jnp.zeros((RAY_OUT - 6, n), jnp.float32)], axis=0
    ).astype(jnp.float32)
    z_t = z_vals.T.astype(jnp.float32)  # (S, N)
    s_pad = (-s) % 8
    if s_pad:  # sublane-align the z/weights blocks; padded rows are unread
        z_t = jnp.pad(z_t, ((0, s_pad), (0, 0)))
    if n_pad:
        # pad rays with d = (0,0,1), z ascending so the dummy rays are benign
        rays8 = jnp.pad(rays8, ((0, 0), (0, n_pad)))
        rays8 = rays8.at[5, n:].set(1.0)
        z_t = jnp.pad(z_t, ((0, 0), (0, n_pad)), constant_values=1.0)

    operands = pack_weights_t(params, dtype)
    grid = ((n + n_pad) // r_tile,)
    s_rows = s + s_pad

    in_specs = [
        pl.BlockSpec((RAY_OUT, r_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((s_rows, r_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    for op in operands:
        in_specs.append(
            pl.BlockSpec(op.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _render_kernel,
        n_samples=s,
        use_new_activation=use_new_activation,
        white_back=white_back,
        cdtype=compute_dtype,
    )
    out, w_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((RAY_OUT, r_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_rows, r_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((RAY_OUT, n + n_pad), jnp.float32),
            jax.ShapeDtypeStruct((s_rows, n + n_pad), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(rays8, z_t, *operands)

    rgb = out[0:3, :n].T          # (N, 3)
    depth = out[3, :n]            # (N,)
    weights = w_t[:s, :n].T       # (N, S)
    return rgb, depth, weights


def _ref_render_level(
    params, rays_t, z_vals, use_new_activation, white_back, compute_dtype
):
    """The same render as the fused kernel, composed from the differentiable
    per-point kernel and ``composite_t`` — used only for the backward pass."""
    from sinnerf_tpu.core.composite import composite_t
    from sinnerf_tpu.ops.fused_mlp_t import fused_nerf_mlp_t

    n, s = z_vals.shape
    o3, d3 = rays_t[0:3], rays_t[3:6]
    xyz = (o3[:, :, None] + d3[:, :, None] * z_vals[None]).reshape(3, n * s)
    dirs = jnp.broadcast_to(d3[:, :, None], (3, n, s)).reshape(3, n * s)
    out = fused_nerf_mlp_t(
        params, xyz, dirs, False, use_new_activation, compute_dtype
    ).reshape(4, n, s)
    comp = composite_t(out[0:3], out[3], z_vals, d3.T, white_back=white_back)
    return comp.rgb, comp.depth, comp.weights


def _frl_fwd(params, rays_t, z_vals, use_new_activation, white_back, compute_dtype):
    out = fused_render_level(
        params, rays_t, z_vals, use_new_activation, white_back, compute_dtype
    )
    return out, (params, rays_t, z_vals)


def _frl_bwd(use_new_activation, white_back, compute_dtype, residuals, g):
    params, rays_t, z_vals = residuals
    _, vjp = jax.vjp(
        lambda p, r, z: _ref_render_level(
            p, r, z, use_new_activation, white_back, compute_dtype
        ),
        params, rays_t, z_vals,
    )
    return vjp(g)


fused_render_level.defvjp(_frl_fwd, _frl_bwd)
