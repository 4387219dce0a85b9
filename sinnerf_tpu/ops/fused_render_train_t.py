"""Fused per-ray render kernels for TRAINING: forward with online
compositing + a fully-fused backward (composite adjoint + MLP backprop).

The per-point training kernels (``fused_mlp_t``) recompute the direction PE
for every sample of a ray (S times) and spend ~6% of the backward on input
grads nobody consumes (training rays come from the sampler and the fine
depths are detached, ``models/rendering.py:311-313``).  Restructuring the
grid from points to rays — like the eval-only ``fused_render_t`` — hoists
the dir PE to once per ray in BOTH directions, folds the compositing
(``core/composite.py``, reference ``models/rendering.py:214-248``) into the
kernels, and drops the dX chain entirely.

Forward (``_train_fwd_kernel``): grid over R_TRAIN-ray tiles, ``fori_loop``
over the S samples; per sample the 13-layer MLP runs on (256, R) blocks and
the transmittance/rgb/depth accumulate in vector registers.  Besides the
composited (8, R) outputs it saves per-sample weights, alphas, and rgb —
the residuals the backward needs to avoid a second full recompute pass.

Backward (``_train_bwd_kernel``): the composite adjoint is computed from
the saved weights/alphas/rgb with one ascending (transmittance
reconstruction: T_{s+1} = T_s * (1 - a_s + 1e-10)) and one descending
(suffix sums S_s = sum_{j>s} c_j w_j) sweep — pure VPU work; then one
ascending MLP recompute+backprop sweep accumulates all weight/bias grads.
Per-sample cotangents:

  c_s       = dL/dw_s = <g_rgb, rgb_s> + g_depth * z_s + g_w_s
                        - white_back * sum(g_rgb)
  dL/da_s   = c_s * T_s - S_s / (1 - a_s + 1e-10)
  dL/dsig_s = dL/da_s * (1 - a_s) * delta_s * [sigma_s + noise_s > 0]
  dL/drgb_s = w_s * g_rgb

Input cotangents (rays, z, noise) are NOT computed — the public wrapper
applies ``stop_gradient`` to those inputs itself, so the custom VJP's zero
cotangents are correct by construction rather than resting on caller
discipline.  Do not use this entry to differentiate with respect to rays
or depths (e.g. pose/depth refinement): use the XLA renderer path
(``mlp_impl='xla'``), which carries the full input-gradient chain.

Sigma noise (``rendering.py:223-224``): drawn OUTSIDE as (N, S) with the
same key/shape as ``core.composite.compute_weights`` (bit-identical stream)
and passed transposed.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sinnerf_tpu.core.activations import shifted_softplus
from sinnerf_tpu.ops.fused_mlp_t import (
    round8,
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

RAY_OUT = 8  # fwd out rows: rgb 0:3, depth 3, weight-sum 4, 5:8 zero
# swept on v5e at the train shape (fwd): 1024 -> 34.2ms, 2048 -> 33.6ms
R_TRAIN = int(os.environ.get("SINNERF_R_TRAIN", "2048"))
# swept on v5e at the train shape (fwd+bwd): 256 -> 144ms, 512 -> 123.5ms,
# 1024 -> 121.2ms; 2048 fails to compile even at a 48MB scoped limit.
# 1024 needs the 32MB scoped-VMEM limit that utils/cache.configure_tpu_env
# sets (under the default 16MB it OOMs at compile — keep the env default in
# sync with this tile).
R_TRAIN_BWD = int(os.environ.get("SINNERF_R_TRAIN_BWD", "1024"))


# ---------------------------------------------------------------------------
# Forward: per-ray grid, online compositing, saves per-sample residuals.
# ---------------------------------------------------------------------------


def _train_fwd_kernel(
    rays_ref,   # (8, R) f32: o 0:3, d 3:6
    z_ref,      # (S8, R) f32 ascending depths (rows >= S unread)
    *refs,
    n_samples: int,
    has_noise: bool,
    use_new_activation: bool,
    white_back: bool,
    cdtype: str,
):
    if has_noise:
        noise_ref = refs[0]
        refs = refs[1:]
    else:
        noise_ref = None
    weight_refs = refs[:26]
    out_ref, w_ref, a_ref, rgb_ref = refs[26], refs[27], refs[28], refs[29]

    cd = jnp.bfloat16 if cdtype == "bfloat16" else jnp.float32
    r = rays_ref.shape[1]
    s8 = w_ref.shape[0]
    rays = rays_ref[:]
    o3 = rays[0:3]
    d3 = rays[3:6]
    dnorm = jnp.sqrt(jnp.sum(d3 * d3, axis=0, keepdims=True))  # (1, R)

    sd, cdir = _pe_fwd(d3, N_FREQS_DIR)
    d_pe = _pe_concat(d3, sd, cdir, DIR_PAD - DIR_CH, cd)  # (32, R)

    def body(s, carry):
        rgb_acc, depth_acc, wsum, trans = carry
        z_s = z_ref[pl.ds(s, 1), :]
        s_next = jnp.minimum(s + 1, n_samples - 1)
        z_next = z_ref[pl.ds(s_next, 1), :]
        delta = jnp.where(s == n_samples - 1, 1e10, z_next - z_s) * dnorm

        xyz = o3 + d3 * z_s
        sx, cx = _pe_fwd(xyz, N_FREQS_XYZ)
        x_pe = _pe_concat(xyz, sx, cx, XYZ_PAD - XYZ_CH, cd)
        rgb8, sig8 = mlp_from_pe(weight_refs, x_pe, d_pe, use_new_activation, False)

        sig = sig8[0:1]
        if has_noise:
            sig = sig + noise_ref[pl.ds(s, 1), :]
        alpha = 1.0 - jnp.exp(-delta * jax.nn.relu(sig))  # (1, R)
        w = alpha * trans
        w_ref[pl.ds(s, 1), :] = w
        a_ref[pl.ds(s, 1), :] = alpha
        rgb_ref[pl.ds(s, 1), :] = rgb8[0:1]
        rgb_ref[pl.ds(s8 + s, 1), :] = rgb8[1:2]
        rgb_ref[pl.ds(2 * s8 + s, 1), :] = rgb8[2:3]
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
        rgb_acc = rgb_acc + (1.0 - wsum)
    out_ref[:] = jnp.concatenate(
        [rgb_acc, depth_acc, wsum, jnp.zeros((RAY_OUT - 5, r), jnp.float32)],
        axis=0,
    )


# ---------------------------------------------------------------------------
# Backward: composite adjoint from residuals + per-sample MLP backprop.
# ---------------------------------------------------------------------------


def _train_bwd_kernel(
    rays_ref,   # (8, R)
    z_ref,      # (S8, R)
    w_ref,      # (S8, R) saved weights
    a_ref,      # (S8, R) saved alphas
    rgb_ref,    # (3*S8, R) saved rgb (channel blocks)
    gout_ref,   # (8, R): g_rgb 0:3, g_depth 3
    gw_ref,     # (S8, R) weights-output cotangent
    *refs,
    n_samples: int,
    has_noise: bool,
    use_new_activation: bool,
    white_back: bool,
    cdtype: str,
):
    if has_noise:
        noise_ref = refs[0]
        refs = refs[1:]
    else:
        noise_ref = None
    (
        w1, w2, w3, w4, w5h, w5x, w6, w7, w8, wfin, wdh, wdx, wrgb, wsig,
        b1, b2, b3, b4, b5, b6, b7, b8, bfin, bd, brgb, bsig,
        dw1, dw2, dw3, dw4, dw5h, dw5x, dw6, dw7, dw8, dwfin, dwdh, dwdx,
        dwrgb, dwsig,
        db1, db2, db3, db4, db5, db6, db7, db8, dbfin, dbd, dbrgb, dbsig,
        dsig_scr,  # (S8, R) scratch: per-sample dL/dsigma
    ) = refs
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (
            dw1, dw2, dw3, dw4, dw5h, dw5x, dw6, dw7, dw8, dwfin, dwdh, dwdx,
            dwrgb, dwsig, db1, db2, db3, db4, db5, db6, db7, db8, dbfin, dbd,
            dbrgb, dbsig,
        ):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    cd = jnp.bfloat16 if cdtype == "bfloat16" else jnp.float32
    r = rays_ref.shape[1]
    s8 = w_ref.shape[0]
    rays = rays_ref[:]
    o3 = rays[0:3]
    d3 = rays[3:6]
    dnorm = jnp.sqrt(jnp.sum(d3 * d3, axis=0, keepdims=True))

    g = gout_ref[:]
    g_rgb = g[0:3]        # (3, R)
    g_depth = g[3:4]      # (1, R)
    g_rgb_sum = jnp.sum(g_rgb, axis=0, keepdims=True)  # (1, R)

    # ---- Stage A: composite adjoint (pure VPU) ---------------------------
    # c_s = dL/dw_s is cheap to rebuild from the resident residual rows, so
    # only the suffix-dependent part of dL/dalpha_s is precomputed here:
    #   dsig_scr row s <- -S_s / u_s,  S_s = sum_{j>s} c_j w_j,
    #   u_s = 1 - a_s + 1e-10.
    # The T_s-dependent part (c_s * T_s) folds into the ascending MLP sweep,
    # which carries the transmittance anyway.
    def c_at(s):
        cr = (
            g_rgb[0:1] * rgb_ref[pl.ds(s, 1), :]
            + g_rgb[1:2] * rgb_ref[pl.ds(s8 + s, 1), :]
            + g_rgb[2:3] * rgb_ref[pl.ds(2 * s8 + s, 1), :]
        )
        c_s = cr + g_depth * z_ref[pl.ds(s, 1), :] + gw_ref[pl.ds(s, 1), :]
        if white_back:
            c_s = c_s - g_rgb_sum
        return c_s

    def body_suffix(i, suffix):
        s = n_samples - 1 - i
        c_s = c_at(s)
        w_s = w_ref[pl.ds(s, 1), :]
        a_s = a_ref[pl.ds(s, 1), :]
        # The divisor must be the forward's u_s = 1 - a_s + 1e-10, but XLA
        # reassociates that into (1 + 1e-10) - a_s == 1 - a_s, which is
        # EXACTLY 0 at saturated alpha -> 0/0 = NaN.  Clamp to the intended
        # 1e-10 floor (the suffix S_s carries the same u_s factor through
        # w_j, so the ratio stays O(1)).
        u_s = jnp.maximum(1.0 - a_s + 1e-10, 1e-10)
        dsig_scr[pl.ds(s, 1), :] = -suffix / u_s
        return suffix + c_s * w_s

    jax.lax.fori_loop(0, n_samples, body_suffix, jnp.zeros((1, r), jnp.float32))

    # ---- Stage B: MLP recompute + backprop, ascending --------------------
    sd, cdir = _pe_fwd(d3, N_FREQS_DIR)
    d_pe = _pe_concat(d3, sd, cdir, DIR_PAD - DIR_CH, cd)  # (32, R)

    def dot(a_ref_, b_val):
        return jnp.dot(a_ref_[:], b_val, preferred_element_type=jnp.float32)

    def dot_nt(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def dot_tn(w_ref_, a):
        return jax.lax.dot_general(
            w_ref_[:], a, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    act = jax.nn.relu

    def rmask(h):
        return h.astype(jnp.float32) > 0.0

    zero5 = jnp.zeros((RAY_OUT - 3, r), jnp.float32)
    zero7 = jnp.zeros((RAY_OUT - 1, r), jnp.float32)

    def body_mlp(s, carry):
        trans, dad_acc = carry
        z_s = z_ref[pl.ds(s, 1), :]
        s_next = jnp.minimum(s + 1, n_samples - 1)
        z_next = z_ref[pl.ds(s_next, 1), :]
        delta = jnp.where(s == n_samples - 1, 1e10, z_next - z_s) * dnorm

        w_s = w_ref[pl.ds(s, 1), :]
        a_s = a_ref[pl.ds(s, 1), :]

        # dL/dalpha_s: T_s part here + the precomputed -S_s/u_s part
        da_alpha = c_at(s) * trans + dsig_scr[pl.ds(s, 1), :]

        # recompute forward for this sample
        xyz = o3 + d3 * z_s
        sx, cx = _pe_fwd(xyz, N_FREQS_XYZ)
        x = _pe_concat(xyz, sx, cx, XYZ_PAD - XYZ_CH, cd)

        h1 = act(dot(w1, x) + b1[:]).astype(cd)
        h2 = act(dot(w2, h1) + b2[:]).astype(cd)
        h3 = act(dot(w3, h2) + b3[:]).astype(cd)
        h4 = act(dot(w4, h3) + b4[:]).astype(cd)
        h5 = act(dot(w5h, h4) + dot(w5x, x) + b5[:]).astype(cd)
        h6 = act(dot(w6, h5) + b6[:]).astype(cd)
        h7 = act(dot(w7, h6) + b7[:]).astype(cd)
        h8 = act(dot(w8, h7) + b8[:]).astype(cd)
        f = (dot(wfin, h8) + bfin[:]).astype(cd)
        a_d = dot(wdh, f) + dot(wdx, d_pe) + bd[:]
        d_act = (shifted_softplus(a_d) if use_new_activation else act(a_d)).astype(cd)
        a_rgb = dot(wrgb, d_act) + brgb[:]  # (8, R)
        sig_head = dot(wsig, h8) + bsig[:]  # (8, R); row 0 real

        # dL/dsigma through alpha = 1 - exp(-delta * relu(sigma + noise))
        ns = sig_head[0:1]
        if has_noise:
            ns = ns + noise_ref[pl.ds(s, 1), :]
        dsig = da_alpha * (1.0 - a_s) * delta * (ns > 0.0).astype(jnp.float32)

        # head backprop (mirrors _bwd_kernel_t, minus input grads)
        g_rgb_s = jnp.concatenate([w_s * g_rgb, zero5], axis=0)  # (8, R)
        if use_new_activation:
            tt = jnp.tanh(0.5 * a_rgb)
            dact_rgb = 0.25 * (1.0 + 2e-3) * (1.0 - tt * tt)
        else:
            sgm = jax.nn.sigmoid(a_rgb)
            dact_rgb = sgm * (1.0 - sgm)
        da_rgb = (g_rgb_s * dact_rgb).astype(cd)
        dwrgb[:] += dot_nt(da_rgb, d_act)
        dbrgb[:] += jnp.sum(da_rgb, axis=1, keepdims=True)
        dd_act = dot_tn(wrgb, da_rgb)

        dssp = jax.nn.sigmoid(a_d - 1.0) if use_new_activation else (a_d > 0)
        da_d = (dd_act * dssp).astype(cd)
        dwdh[:] += dot_nt(da_d, f)
        dbd[:] += jnp.sum(da_d, axis=1, keepdims=True)
        df = dot_tn(wdh, da_d).astype(cd)

        dwfin[:] += dot_nt(df, h8)
        dbfin[:] += jnp.sum(df, axis=1, keepdims=True)
        dh8 = dot_tn(wfin, df)

        g_sig = jnp.concatenate([dsig, zero7], axis=0).astype(cd)  # (8, R)
        dwsig[:] += dot_nt(g_sig, h8)
        dbsig[:] += jnp.sum(g_sig, axis=1, keepdims=True)
        dh8 = dh8 + dot_tn(wsig, g_sig)

        da8 = (dh8 * rmask(h8)).astype(cd)
        dw8[:] += dot_nt(da8, h7)
        db8[:] += jnp.sum(da8, axis=1, keepdims=True)
        da7 = (dot_tn(w8, da8) * rmask(h7)).astype(cd)
        dw7[:] += dot_nt(da7, h6)
        db7[:] += jnp.sum(da7, axis=1, keepdims=True)
        da6 = (dot_tn(w7, da7) * rmask(h6)).astype(cd)
        dw6[:] += dot_nt(da6, h5)
        db6[:] += jnp.sum(da6, axis=1, keepdims=True)
        da5 = (dot_tn(w6, da6) * rmask(h5)).astype(cd)
        dw5h[:] += dot_nt(da5, h4)
        dw5x[:] += dot_nt(da5, x)
        db5[:] += jnp.sum(da5, axis=1, keepdims=True)
        da4 = (dot_tn(w5h, da5) * rmask(h4)).astype(cd)
        dw4[:] += dot_nt(da4, h3)
        db4[:] += jnp.sum(da4, axis=1, keepdims=True)
        da3 = (dot_tn(w4, da4) * rmask(h3)).astype(cd)
        dw3[:] += dot_nt(da3, h2)
        db3[:] += jnp.sum(da3, axis=1, keepdims=True)
        da2 = (dot_tn(w3, da3) * rmask(h2)).astype(cd)
        dw2[:] += dot_nt(da2, h1)
        db2[:] += jnp.sum(da2, axis=1, keepdims=True)
        da1 = (dot_tn(w2, da2) * rmask(h1)).astype(cd)
        dw1[:] += dot_nt(da1, x)
        db1[:] += jnp.sum(da1, axis=1, keepdims=True)

        # dir-path weight grad: d_pe is per-ray constant, so
        # dwdx = (sum_s da_d_s) @ d_pe^T — accumulate and contract once.
        return trans * (1.0 - a_s + 1e-10), dad_acc + da_d.astype(jnp.float32)

    _, dad_acc = jax.lax.fori_loop(
        0,
        n_samples,
        body_mlp,
        (jnp.ones((1, r), jnp.float32), jnp.zeros((128, r), jnp.float32)),
    )
    dwdx[:] += dot_nt(dad_acc, d_pe.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Wrapper with custom VJP.
# ---------------------------------------------------------------------------


def _prep(rays_t, z_vals, noise, r_tile):
    """Pad/transpose host-side arrays into kernel layouts."""
    n, s = z_vals.shape
    s8 = round8(s)
    n_pad = (-n) % r_tile
    rays8 = rays_t[0:6]
    rays8 = jnp.concatenate(
        [rays8, jnp.zeros((RAY_OUT - 6, n), jnp.float32)], axis=0
    ).astype(jnp.float32)
    z_t = z_vals.T.astype(jnp.float32)
    if s8 > s:
        z_t = jnp.pad(z_t, ((0, s8 - s), (0, 0)))
    noise_t = None
    if noise is not None:
        noise_t = noise.T.astype(jnp.float32)
        if s8 > s:
            noise_t = jnp.pad(noise_t, ((0, s8 - s), (0, 0)))
    if n_pad:
        rays8 = jnp.pad(rays8, ((0, 0), (0, n_pad)))
        rays8 = rays8.at[5, n:].set(1.0)
        z_t = jnp.pad(z_t, ((0, 0), (0, n_pad)), constant_values=1.0)
        if noise_t is not None:
            noise_t = jnp.pad(noise_t, ((0, 0), (0, n_pad)))
    return rays8, z_t, noise_t, s8, n_pad


def _weight_specs(operands):
    return [
        pl.BlockSpec(op.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for op in operands
    ]


def _run_fwd(params, rays_t, z_vals, noise, use_new_activation, white_back,
             compute_dtype):
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    n, s = z_vals.shape
    # clamp the tile to the 512-rounded ray count (tiny renders would
    # otherwise pad to a full R_TRAIN of dummy rays)
    r_tile = min(R_TRAIN, -(-n // 512) * 512)
    rays8, z_t, noise_t, s8, n_pad = _prep(rays_t, z_vals, noise, r_tile)
    operands = pack_weights_t(params, dtype)
    grid = ((n + n_pad) // r_tile,)

    in_specs = [
        pl.BlockSpec((RAY_OUT, r_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((s8, r_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    args = [rays8, z_t]
    if noise_t is not None:
        in_specs.append(
            pl.BlockSpec((s8, r_tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(noise_t)
    in_specs += _weight_specs(operands)
    args += operands

    kernel = functools.partial(
        _train_fwd_kernel,
        n_samples=s,
        has_noise=noise_t is not None,
        use_new_activation=use_new_activation,
        white_back=white_back,
        cdtype=compute_dtype,
    )
    nt = n + n_pad
    out, w_t, a_t, rgb_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((RAY_OUT, r_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s8, r_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s8, r_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * s8, r_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((RAY_OUT, nt), jnp.float32),
            jax.ShapeDtypeStruct((s8, nt), jnp.float32),
            jax.ShapeDtypeStruct((s8, nt), jnp.float32),
            jax.ShapeDtypeStruct((3 * s8, nt), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return out, w_t, a_t, rgb_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_render_level_train_vjp(
    params: Dict[str, Any],
    rays_t: jnp.ndarray,   # (>=6, N) f32: o 0:3, d 3:6 (unnormalized)
    z_vals: jnp.ndarray,   # (N, S) ascending sample depths
    noise: Optional[jnp.ndarray],  # (N, S) sigma noise or None
    use_new_activation: bool = True,
    white_back: bool = False,
    compute_dtype: str = "float32",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Training render of one level: (rgb (N, 3), depth (N,), weights (N, S)).

    Same semantics as ``composite_t(fused_nerf_mlp_t(...))`` with
    ``sigmas + noise`` (``models/rendering.py:214-248``).  The custom VJP is
    a fully fused per-ray kernel producing parameter grads ONLY — rays_t,
    z_vals, and noise receive zero cotangents, so the caller must
    stop_gradient them (the training step does: rays come from the sampler,
    fine depths are detached per ``rendering.py:311-313``).
    """
    out, w_t, _, _ = _run_fwd(
        params, rays_t, z_vals, noise, use_new_activation, white_back,
        compute_dtype,
    )
    n, s = z_vals.shape
    return out[0:3, :n].T, out[3, :n], w_t[:s, :n].T


def _frlt_fwd(params, rays_t, z_vals, noise, use_new_activation, white_back,
              compute_dtype):
    out, w_t, a_t, rgb_t = _run_fwd(
        params, rays_t, z_vals, noise, use_new_activation, white_back,
        compute_dtype,
    )
    n, s = z_vals.shape
    res = (params, rays_t, z_vals, noise, w_t, a_t, rgb_t)
    return (out[0:3, :n].T, out[3, :n], w_t[:s, :n].T), res


def _frlt_bwd(use_new_activation, white_back, compute_dtype, res, g):
    from sinnerf_tpu.ops.fused_mlp_t import _unpack_grads_t

    params, rays_t, z_vals, noise, w_t, a_t, rgb_t = res
    g_rgb, g_depth, g_w = g  # (N,3), (N,), (N,S)
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    n, s = z_vals.shape
    r_tile = min(R_TRAIN_BWD, -(-n // 512) * 512)
    rays8, z_t, noise_t, s8, n_pad = _prep(rays_t, z_vals, noise, r_tile)
    nt = n + n_pad

    def pad_lanes(x):
        return jnp.pad(x, ((0, 0), (0, nt - x.shape[1])))

    gout = jnp.concatenate(
        [
            g_rgb.T.astype(jnp.float32),
            g_depth[None].astype(jnp.float32),
            jnp.zeros((RAY_OUT - 4, n), jnp.float32),
        ],
        axis=0,
    )
    gout = pad_lanes(gout)
    gw_t = g_w.T.astype(jnp.float32)
    if s8 > s:
        gw_t = jnp.pad(gw_t, ((0, s8 - s), (0, 0)))
    gw_t = pad_lanes(gw_t)
    # residuals were computed at the fwd tile; re-tile to the bwd grid is a
    # no-op on the padded lane axis when R_TRAIN % R_TRAIN_BWD == 0, else pad
    if w_t.shape[1] < nt:
        w_t = pad_lanes(w_t)
        a_t = pad_lanes(a_t)
        rgb_t = pad_lanes(rgb_t)
    else:
        w_t = w_t[:, :nt]
        a_t = a_t[:, :nt]
        rgb_t = rgb_t[:, :nt]

    operands = pack_weights_t(params, dtype)
    grid = (nt // r_tile,)

    def tiled(rows):
        return pl.BlockSpec((rows, r_tile), lambda i: (0, i), memory_space=pltpu.VMEM)

    in_specs = [
        tiled(RAY_OUT), tiled(s8), tiled(s8), tiled(s8), tiled(3 * s8),
        tiled(RAY_OUT), tiled(s8),
    ]
    args = [rays8, z_t, w_t, a_t, rgb_t, gout, gw_t]
    if noise_t is not None:
        in_specs.append(tiled(s8))
        args.append(noise_t)
    in_specs += _weight_specs(operands)
    args += operands

    w_shapes = [op.shape for op in operands[:14]]
    b_shapes = [op.shape for op in operands[14:]]
    out_shapes = [jax.ShapeDtypeStruct(sh, jnp.float32) for sh in w_shapes + b_shapes]
    out_specs = [
        pl.BlockSpec(sh, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for sh in w_shapes + b_shapes
    ]

    kernel = functools.partial(
        _train_bwd_kernel,
        n_samples=s,
        has_noise=noise_t is not None,
        use_new_activation=use_new_activation,
        white_back=white_back,
        cdtype=compute_dtype,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((s8, r_tile), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(*args)
    params_grad = _unpack_grads_t(outs[:14], outs[14:26], params)
    d_rays = jnp.zeros_like(rays_t)
    d_z = jnp.zeros_like(z_vals)
    d_noise = None if noise is None else jnp.zeros_like(noise)
    return params_grad, d_rays, d_z, d_noise


_fused_render_level_train_vjp.defvjp(_frlt_fwd, _frlt_bwd)


def fused_render_level_train(
    params: Dict[str, Any],
    rays_t: jnp.ndarray,
    z_vals: jnp.ndarray,
    noise: Optional[jnp.ndarray],
    use_new_activation: bool = True,
    white_back: bool = False,
    compute_dtype: str = "float32",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Public entry: stop_gradient rays/z/noise BEFORE the custom-VJP kernel
    so its zero input-cotangents are correct by construction — a caller that
    (wrongly) tries to differentiate w.r.t. ray geometry through this kernel
    gets the same zeros plain ``stop_gradient`` semantics give, not silently
    wrong values from an unimplemented gradient chain.  Pose/depth
    refinement must use the XLA path (renderer mlp_impl='xla'), which has
    the full input-gradient chain."""
    return _fused_render_level_train_vjp(
        params,
        jax.lax.stop_gradient(rays_t),
        jax.lax.stop_gradient(z_vals),
        None if noise is None else jax.lax.stop_gradient(noise),
        use_new_activation,
        white_back,
        compute_dtype,
    )
