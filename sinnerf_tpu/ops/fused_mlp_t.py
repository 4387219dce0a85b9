"""Channel-major (transposed) fused NeRF-MLP Pallas kernel.

Layout rationale: TPU HBM pads an array's minor dim to 128 lanes, so the
row-major hot path's point-level tensors — xyz (N, 3), PE (N, 63/27), packed
(N, 128) — are stored up to 42x inflated, and the measured cost of PE/layout
exceeded the MLP itself.  Here every point-level tensor is (channels, N) with
the multi-million point axis on lanes: inputs (64, N)+(32, N), activations
(256, T) in VMEM, output (8, N).  All matmuls are ``W^T @ x`` contractions on
the MXU.

Weight layout: blocked-PE row permutation (core.encoding.blocked_perm) then
transposed to (out, in); the skip/dir concats are algebraically split as in
``fused_mlp.py``.

Backward: a fully fused transposed kernel (``_bwd_kernel_t``) — recompute
forward in VMEM, backprop all weight/bias/input grads with weight-grad blocks
accumulated across the sequential grid.  Verified against XLA autodiff.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sinnerf_tpu.core.activations import shifted_softplus, widened_sigmoid
from sinnerf_tpu.models.nerf import permute_params_for_blocked_pe

import os

XYZ_CH = 63
XYZ_PAD = 64
DIR_CH = 27
DIR_PAD = 32
WIDTH = 256
HALF = 128
OUT_PAD = 8
# points (lanes) per grid step; env-tunable for on-hardware sweeps
TILE_T = int(os.environ.get("SINNERF_TILE_T", "4096"))  # swept on v5e: 4096 > 2048 > 8192
# bf16 bias+activation epilogues in the forward kernel (experimental knob)
BF16_EPILOGUE = os.environ.get("SINNERF_BF16_EPILOGUE", "0") == "1"


def _pad_cols(w: jnp.ndarray, cols: int) -> jnp.ndarray:
    return jnp.pad(w, ((0, 0), (0, cols - w.shape[1])))


def pack_weights_t(params: Dict[str, Any], dtype) -> Tuple[jnp.ndarray, ...]:
    """Blocked-permute, transpose to (out, in), pad, and list the operands."""
    p = permute_params_for_blocked_pe(params)

    def t(w):
        return w.T.astype(dtype)

    w1t = _pad_cols(t(p["xyz_encoding_1"]["w"]), XYZ_PAD)  # (256, 64)
    w5 = t(p["xyz_encoding_5"]["w"])  # (256, 63+256)
    w5xt = _pad_cols(w5[:, :XYZ_CH], XYZ_PAD)
    w5ht = w5[:, XYZ_CH:]
    wd = t(p["dir_encoding"]["w"])  # (128, 256+27)
    wdht = wd[:, :WIDTH]
    wdxt = _pad_cols(wd[:, WIDTH:], DIR_PAD)
    wrgbt = jnp.pad(t(p["rgb"]["w"]), ((0, OUT_PAD - 3), (0, 0)))  # (8, 128)
    wsigt = jnp.pad(t(p["sigma"]["w"]), ((0, OUT_PAD - 1), (0, 0)))  # (8, 256)

    ws = [
        w1t,
        t(p["xyz_encoding_2"]["w"]),
        t(p["xyz_encoding_3"]["w"]),
        t(p["xyz_encoding_4"]["w"]),
        w5ht,
        w5xt,
        t(p["xyz_encoding_6"]["w"]),
        t(p["xyz_encoding_7"]["w"]),
        t(p["xyz_encoding_8"]["w"]),
        t(p["xyz_encoding_final"]["w"]),
        wdht,
        wdxt,
        wrgbt,
        wsigt,
    ]

    def b(name, pad=None):
        v = p[name]["b"].astype(jnp.float32)
        if pad is not None:
            v = jnp.pad(v, (0, pad - v.shape[0]))
        return v.reshape(-1, 1)

    bs = [
        b("xyz_encoding_1"),
        b("xyz_encoding_2"),
        b("xyz_encoding_3"),
        b("xyz_encoding_4"),
        b("xyz_encoding_5"),
        b("xyz_encoding_6"),
        b("xyz_encoding_7"),
        b("xyz_encoding_8"),
        b("xyz_encoding_final"),
        b("dir_encoding"),
        b("rgb", OUT_PAD),
        b("sigma", OUT_PAD),
    ]
    return tuple(ws) + tuple(bs)


def _kernel_t(x_ref, d_ref, *refs, use_new_activation: bool, sigma_only: bool):
    (
        w1, w2, w3, w4, w5h, w5x, w6, w7, w8, wfin, wdh, wdx, wrgb, wsig,
        b1, b2, b3, b4, b5, b6, b7, b8, bfin, bd, brgb, bsig,
        rgb_ref, sig_ref,
    ) = refs

    x = x_ref[:]  # (64, T)

    act = jax.nn.relu
    cd = x.dtype

    if BF16_EPILOGUE and cd == jnp.bfloat16:
        # epilogue (bias+relu) in bf16: halves VPU traffic per layer; the
        # bf16 rounding of the f32 accumulator happens either way
        def dot(a_ref, b_val):
            return jnp.dot(
                a_ref[:], b_val, preferred_element_type=jnp.float32
            ).astype(cd)

        def ep(b_ref):
            return b_ref[:].astype(cd)
    else:
        def dot(a_ref, b_val):
            return jnp.dot(a_ref[:], b_val, preferred_element_type=jnp.float32)

        def ep(b_ref):
            return b_ref[:]

    h = act(dot(w1, x) + ep(b1)).astype(cd)
    h = act(dot(w2, h) + ep(b2)).astype(cd)
    h = act(dot(w3, h) + ep(b3)).astype(cd)
    h = act(dot(w4, h) + ep(b4)).astype(cd)
    h = act(dot(w5h, h) + dot(w5x, x) + ep(b5)).astype(cd)
    h = act(dot(w6, h) + ep(b6)).astype(cd)
    h = act(dot(w7, h) + ep(b7)).astype(cd)
    h = act(dot(w8, h) + ep(b8)).astype(cd)

    def dot32(a_ref, b_val):
        return jnp.dot(a_ref[:], b_val, preferred_element_type=jnp.float32)

    # head epilogues stay f32: Mosaic cannot legalize bf16 log1p/tanh chains,
    # and these are a small share of the VPU work
    sigma = dot32(wsig, h) + bsig[:]  # (8, T); row 0 real
    sig_ref[:] = sigma.astype(sig_ref.dtype)

    if sigma_only:
        rgb_ref[:] = jnp.zeros(rgb_ref.shape, rgb_ref.dtype)
        return

    f = (dot32(wfin, h) + bfin[:]).astype(cd)
    d_in = d_ref[:]  # (32, T)
    a_d = dot32(wdh, f) + dot32(wdx, d_in) + bd[:]
    d = (shifted_softplus(a_d) if use_new_activation else act(a_d)).astype(cd)
    rgb = dot32(wrgb, d) + brgb[:]  # (8, T); rows 0:3 real
    rgb = widened_sigmoid(rgb) if use_new_activation else jax.nn.sigmoid(rgb)
    rgb_ref[:] = rgb.astype(rgb_ref.dtype)


def _forward_t(
    x_t: jnp.ndarray,
    d_t: jnp.ndarray,
    operands: Tuple[jnp.ndarray, ...],
    use_new_activation: bool,
    sigma_only: bool,
) -> jnp.ndarray:
    n = x_t.shape[1]
    grid = (n // TILE_T,)

    in_specs = [
        pl.BlockSpec((XYZ_PAD, TILE_T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((DIR_PAD, TILE_T), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    for op in operands:
        in_specs.append(
            pl.BlockSpec(op.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _kernel_t, use_new_activation=use_new_activation, sigma_only=sigma_only
    )
    rgb, sig = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((OUT_PAD, TILE_T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT_PAD, TILE_T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((OUT_PAD, n), jnp.float32),
            jax.ShapeDtypeStruct((OUT_PAD, n), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x_t, d_t, *operands)
    return rgb, sig


# ---------------------------------------------------------------------------
# Transposed backward kernel: recompute-forward + full backprop in VMEM,
# weight grads accumulated across the sequential grid into shared blocks.
# ---------------------------------------------------------------------------

TILE_BWD_T = int(os.environ.get("SINNERF_TILE_BWD_T", "1024"))


def _bwd_kernel_t(x_ref, d_ref, grgb_ref, gsig_ref, *refs, use_new_activation: bool):
    (
        w1, w2, w3, w4, w5h, w5x, w6, w7, w8, wfin, wdh, wdx, wrgb, wsig,
        b1, b2, b3, b4, b5, b6, b7, b8, bfin, bd, brgb, bsig,
        dw1, dw2, dw3, dw4, dw5h, dw5x, dw6, dw7, dw8, dwfin, dwdh, dwdx,
        dwrgb, dwsig,
        db1, db2, db3, db4, db5, db6, db7, db8, dbfin, dbd, dbrgb, dbsig,
        dx_ref, dd_ref,
    ) = refs

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (
            dw1, dw2, dw3, dw4, dw5h, dw5x, dw6, dw7, dw8, dwfin, dwdh, dwdx,
            dwrgb, dwsig, db1, db2, db3, db4, db5, db6, db7, db8, dbfin, dbd,
            dbrgb, dbsig,
        ):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    x = x_ref[:]      # (64, T)
    d_in = d_ref[:]   # (32, T)
    g_rgb = grgb_ref[:]  # (8, T): rows 0:3 = d_rgb, rest zero
    g_sig_in = gsig_ref[:]  # (8, T): row 0 = d_sigma, rest zero

    def dot(a_ref, b_val):
        return jnp.dot(a_ref[:], b_val, preferred_element_type=jnp.float32)

    def dot_nt(a, b):
        """a (o, T) @ b (i, T)^T -> (o, i); f32 accumulation."""
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def dot_tn(w_ref, a):
        """w (o, i)^T @ a (o, T) -> (i, T)."""
        return jax.lax.dot_general(
            w_ref[:], a, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    act = jax.nn.relu
    cd = x.dtype

    def rmask(h):
        # Mosaic on v5e cannot compare bf16 directly ("Target does not
        # support this comparison"); compare in f32.
        return h.astype(jnp.float32) > 0.0

    # recompute forward
    h1 = act(dot(w1, x) + b1[:]).astype(cd)
    h2 = act(dot(w2, h1) + b2[:]).astype(cd)
    h3 = act(dot(w3, h2) + b3[:]).astype(cd)
    h4 = act(dot(w4, h3) + b4[:]).astype(cd)
    h5 = act(dot(w5h, h4) + dot(w5x, x) + b5[:]).astype(cd)
    h6 = act(dot(w6, h5) + b6[:]).astype(cd)
    h7 = act(dot(w7, h6) + b7[:]).astype(cd)
    h8 = act(dot(w8, h7) + b8[:]).astype(cd)
    f = (dot(wfin, h8) + bfin[:]).astype(cd)
    a_d = dot(wdh, f) + dot(wdx, d_in) + bd[:]
    d_act = (shifted_softplus(a_d) if use_new_activation else act(a_d)).astype(cd)
    a_rgb = dot(wrgb, d_act) + brgb[:]  # (8, T)

    # heads
    if use_new_activation:
        t = jnp.tanh(0.5 * a_rgb)
        dact_rgb = 0.25 * (1.0 + 2e-3) * (1.0 - t * t)
    else:
        s = jax.nn.sigmoid(a_rgb)
        dact_rgb = s * (1.0 - s)
    da_rgb = (g_rgb * dact_rgb).astype(cd)
    dwrgb[:] += dot_nt(da_rgb, d_act)
    dbrgb[:] += jnp.sum(da_rgb, axis=1, keepdims=True)
    dd_act = dot_tn(wrgb, da_rgb)

    dssp = (
        jax.nn.sigmoid(a_d - 1.0) if use_new_activation else (a_d > 0)
    )
    da_d = (dd_act * dssp).astype(cd)
    dwdh[:] += dot_nt(da_d, f)
    dwdx[:] += dot_nt(da_d, d_in)
    dbd[:] += jnp.sum(da_d, axis=1, keepdims=True)
    df = dot_tn(wdh, da_d).astype(cd)

    dwfin[:] += dot_nt(df, h8)
    dbfin[:] += jnp.sum(df, axis=1, keepdims=True)
    dh8 = dot_tn(wfin, df)

    g_sig = g_sig_in.astype(cd)
    dwsig[:] += dot_nt(g_sig, h8)
    dbsig[:] += jnp.sum(g_sig, axis=1, keepdims=True)
    dh8 = dh8 + dot_tn(wsig, g_sig)

    # trunk
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

    dx = dot_tn(w1, da1) + dot_tn(w5x, da5)
    dx_ref[:] = dx.astype(dx_ref.dtype)
    dd_ref[:] = dot_tn(wdx, da_d).astype(dd_ref.dtype)


def _backward_t(
    x_t: jnp.ndarray,
    d_t: jnp.ndarray,
    g_rgb8: jnp.ndarray,
    g_sig8: jnp.ndarray,
    operands: Tuple[jnp.ndarray, ...],
    use_new_activation: bool,
):
    n = x_t.shape[1]
    grid = (n // TILE_BWD_T,)

    in_specs = [
        pl.BlockSpec((XYZ_PAD, TILE_BWD_T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((DIR_PAD, TILE_BWD_T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((OUT_PAD, TILE_BWD_T), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((OUT_PAD, TILE_BWD_T), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    for op in operands:
        in_specs.append(
            pl.BlockSpec(op.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    w_shapes = [op.shape for op in operands[:14]]
    b_shapes = [op.shape for op in operands[14:]]
    out_shapes = (
        [jax.ShapeDtypeStruct(s, jnp.float32) for s in w_shapes + b_shapes]
        + [
            jax.ShapeDtypeStruct((XYZ_PAD, n), jnp.float32),
            jax.ShapeDtypeStruct((DIR_PAD, n), jnp.float32),
        ]
    )
    out_specs = (
        [
            pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for s in w_shapes + b_shapes
        ]
        + [
            pl.BlockSpec((XYZ_PAD, TILE_BWD_T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((DIR_PAD, TILE_BWD_T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
    )

    kernel = functools.partial(_bwd_kernel_t, use_new_activation=use_new_activation)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=jax.default_backend() != "tpu",
    )(x_t, d_t, g_rgb8, g_sig8, *operands)
    return outs[:14], outs[14:26], outs[26], outs[27]


def _unpack_grads_t(dws, dbs, params):
    """Transposed padded grads -> reference-order param-pytree grads."""
    import numpy as np

    from sinnerf_tpu.core.encoding import blocked_perm

    (
        dw1, dw2, dw3, dw4, dw5h, dw5x, dw6, dw7, dw8, dwfin, dwdh, dwdx,
        dwrgb, dwsig,
    ) = dws
    (db1, db2, db3, db4, db5, db6, db7, db8, dbfin, dbd, dbrgb, dbsig) = dbs

    inv_x = np.argsort(blocked_perm(3, 10))
    inv_d = np.argsort(blocked_perm(3, 4))

    grads = {
        "xyz_encoding_1": {"w": dw1.T[:XYZ_CH][inv_x], "b": db1[:, 0]},
        "xyz_encoding_2": {"w": dw2.T, "b": db2[:, 0]},
        "xyz_encoding_3": {"w": dw3.T, "b": db3[:, 0]},
        "xyz_encoding_4": {"w": dw4.T, "b": db4[:, 0]},
        "xyz_encoding_5": {
            "w": jnp.concatenate([dw5x.T[:XYZ_CH][inv_x], dw5h.T], axis=0),
            "b": db5[:, 0],
        },
        "xyz_encoding_6": {"w": dw6.T, "b": db6[:, 0]},
        "xyz_encoding_7": {"w": dw7.T, "b": db7[:, 0]},
        "xyz_encoding_8": {"w": dw8.T, "b": db8[:, 0]},
        "xyz_encoding_final": {"w": dwfin.T, "b": dbfin[:, 0]},
        "dir_encoding": {
            "w": jnp.concatenate([dwdh.T, dwdx.T[:DIR_CH][inv_d]], axis=0),
            "b": dbd[:, 0],
        },
        "rgb": {"w": dwrgb.T[:, 0:3], "b": dbrgb[0:3, 0]},
        "sigma": {"w": dwsig.T[:, 0:1], "b": dbsig[0:1, 0]},
    }
    return jax.tree_util.tree_map(
        lambda gv, pv: gv.astype(pv.dtype), grads, params
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_nerf_mlp_t(
    params: Dict[str, Any],
    xyz_pe_t: jnp.ndarray,
    dir_pe_t: Optional[jnp.ndarray],
    sigma_only: bool = False,
    use_new_activation: bool = True,
    compute_dtype: str = "float32",
):
    """Pallas channel-major MLP: xyz_pe_t (63, N), dir_pe_t (27, N) in the
    blocked PE layout -> (4, N) [rgb, sigma] (or (1, N) when sigma_only)."""
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    n = xyz_pe_t.shape[1]
    n_pad = (-n) % TILE_T
    x = jnp.pad(
        xyz_pe_t.astype(dtype), ((0, XYZ_PAD - XYZ_CH), (0, n_pad))
    )
    if dir_pe_t is None:
        d = jnp.zeros((DIR_PAD, n + n_pad), dtype)
    else:
        d = jnp.pad(dir_pe_t.astype(dtype), ((0, DIR_PAD - DIR_CH), (0, n_pad)))
    operands = pack_weights_t(params, dtype)
    rgb, sig = _forward_t(x, d, operands, use_new_activation, sigma_only)
    if sigma_only:
        return sig[0:1, :n]
    return jnp.concatenate([rgb[0:3, :n], sig[0:1, :n]], axis=0)


def _fwd(params, xyz_pe_t, dir_pe_t, sigma_only, use_new_activation, compute_dtype):
    out = fused_nerf_mlp_t(
        params, xyz_pe_t, dir_pe_t, sigma_only, use_new_activation, compute_dtype
    )
    return out, (params, xyz_pe_t, dir_pe_t)


def _bwd(sigma_only, use_new_activation, compute_dtype, residuals, g):
    """Fused transposed backward: recompute + full backprop in one kernel."""
    params, xyz_pe_t, dir_pe_t = residuals
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    n = xyz_pe_t.shape[1]
    n_pad = (-n) % TILE_BWD_T

    x = jnp.pad(xyz_pe_t.astype(dtype), ((0, XYZ_PAD - XYZ_CH), (0, n_pad)))
    if dir_pe_t is None:
        d = jnp.zeros((DIR_PAD, n + n_pad), dtype)
    else:
        d = jnp.pad(dir_pe_t.astype(dtype), ((0, DIR_PAD - DIR_CH), (0, n_pad)))

    g = g.astype(jnp.float32)
    if sigma_only:  # g (1, N): sigma grads only
        g_rgb8 = jnp.zeros((OUT_PAD, n), jnp.float32)
        g_sig8 = jnp.pad(g, ((0, OUT_PAD - 1), (0, 0)))
    else:  # g (4, N): rows 0:3 rgb, row 3 sigma
        g_rgb8 = jnp.pad(g[0:3], ((0, OUT_PAD - 3), (0, 0)))
        g_sig8 = jnp.pad(g[3:4], ((0, OUT_PAD - 1), (0, 0)))
    g_rgb8 = jnp.pad(g_rgb8, ((0, 0), (0, n_pad)))
    g_sig8 = jnp.pad(g_sig8, ((0, 0), (0, n_pad)))

    operands = pack_weights_t(params, dtype)
    dws, dbs, dx, dd = _backward_t(x, d, g_rgb8, g_sig8, operands, use_new_activation)
    params_grad = _unpack_grads_t(dws, dbs, params)
    dxyz = dx[:XYZ_CH, :n].astype(xyz_pe_t.dtype)
    if dir_pe_t is None:
        return params_grad, dxyz, None
    return params_grad, dxyz, dd[:DIR_CH, :n].astype(dir_pe_t.dtype)


fused_nerf_mlp_t.defvjp(_fwd, _bwd)
