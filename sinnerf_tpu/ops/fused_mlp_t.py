"""Channel-major (transposed) fused PE+NeRF-MLP Pallas kernel.

Layout rationale: TPU HBM pads an array's minor dim to 128 lanes, so the
row-major hot path's point-level tensors — xyz (N, 3), PE (N, 63/27), packed
(N, 128) — are stored up to 42x inflated, and the measured cost of PE/layout
exceeded the MLP itself.  Here every point-level tensor is (channels, N) with
the multi-million point axis on lanes: input (8, N) packed xyz+dir f32,
activations (256, T) in VMEM, output (8, N).  All matmuls are ``W^T @ x``
contractions on the MXU.

Positional encoding runs INSIDE the kernel (round-2 redesign): the kernel
input is the packed raw (8, T) f32 block — rows 0:3 xyz, 3:6 dir — and the
63/27-channel blocked PE is computed on the VPU right before the first
matmul.  Measured on v5e at the fine-pass size (8.4M points): the in-kernel
PE adds ~5 ms of kernel time but removes ~33 ms of XLA-side PE + pad +
dtype-cast passes and cuts input DMA traffic 6x (192 B/point of bf16 PE ->
32 B/point packed f32); kernel-only throughput is ~151 TF/s issued (~77% of
v5e bf16 peak) and bit-identical to the PE-outside path.

Weight layout: blocked-PE row permutation (core.encoding.blocked_perm) then
transposed to (out, in); the skip/dir concats are algebraically split as in
the row-major reference ``models/nerf.py:105-148``.

Backward: a fully fused transposed kernel (``_bwd_kernel_t``) — recompute
PE + forward in VMEM, backprop all weight/bias grads plus the input grads
through the exact double-angle recurrence.  Verified against XLA autodiff.
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
IN_PAD = 8   # packed input rows: xyz 0:3, dir 3:6, 6:8 zero
OUT_PAD = 8  # packed output rows: rgb 0:3, sigma 3, 4:8 zero
N_FREQS_XYZ = 10
N_FREQS_DIR = 4
# exact sin/cos evaluation every PE_RESTART doublings bounds the double-angle
# recurrence error to ~1e-5 (error roughly doubles per step); must match
# core.encoding.positional_encoding_blocked_t for bit-parity with the XLA path
PE_RESTART = 4
# points (lanes) per grid step; env-tunable for on-hardware sweeps
TILE_T = int(os.environ.get("SINNERF_TILE_T", "4096"))  # swept on v5e: 4096 > 2048 > 8192
TILE_BWD_T = int(os.environ.get("SINNERF_TILE_BWD_T", "1024"))


def round8(x: int) -> int:
    """Round up to the TPU f32 sublane granule (8 rows)."""
    return -(-x // 8) * 8


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


# ---------------------------------------------------------------------------
# In-kernel blocked positional encoding (double-angle recurrence) + its exact
# backward.  Same math as core.encoding.positional_encoding_blocked_t.
# ---------------------------------------------------------------------------


def _pe_fwd(x3: jnp.ndarray, n_freqs: int):
    """x3 (3, T) f32 -> ([sin_k (3, T)], [cos_k (3, T)]) f32, k = 0..F-1."""
    sins, coss = [], []
    s = c = None
    for k in range(n_freqs):
        if k % PE_RESTART == 0:
            xk = x3 * (2.0 ** k)
            s, c = jnp.sin(xk), jnp.cos(xk)
        else:
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        sins.append(s)
        coss.append(c)
    return sins, coss


def _pe_concat(x3, sins, coss, pad_rows: int, dtype) -> jnp.ndarray:
    """(3, T) + F sin + F cos blocks -> (3*(2F+1) + pad_rows, T) dtype."""
    out = jnp.concatenate([x3] + sins + coss, axis=0)
    if pad_rows:
        out = jnp.concatenate(
            [out, jnp.zeros((pad_rows, x3.shape[1]), x3.dtype)], axis=0
        )
    return out.astype(dtype)


def _pe_bwd(sins, coss, dpe: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """Backprop dpe (>=3*(2F+1), T) f32 through the recurrence -> dx3 (3, T).

    Exact adjoint of ``_pe_fwd``'s op graph (including the recurrence
    s_{k+1} = 2 s_k c_k, c_{k+1} = 1 - 2 s_k^2), so the custom VJP matches
    XLA autodiff of ``positional_encoding_blocked_t`` bit-for-bit-ish.
    """
    dsin = [dpe[3 + 3 * k : 6 + 3 * k] for k in range(n_freqs)]
    dcos = [dpe[3 + 3 * n_freqs + 3 * k : 6 + 3 * n_freqs + 3 * k] for k in range(n_freqs)]
    dx = dpe[0:3]
    ds_next = dc_next = None
    for k in range(n_freqs - 1, -1, -1):
        ds, dc = dsin[k], dcos[k]
        if k + 1 < n_freqs and (k + 1) % PE_RESTART != 0:
            # level k+1 was derived from level k by the recurrence
            ds = ds + 2.0 * (coss[k] * ds_next) - 4.0 * (sins[k] * dc_next)
            dc = dc + 2.0 * (sins[k] * ds_next)
        if k % PE_RESTART == 0:
            # exact level: s = sin(2^k x), c = cos(2^k x)
            dx = dx + (2.0 ** k) * (coss[k] * ds - sins[k] * dc)
        ds_next, dc_next = ds, dc
    return dx


# ---------------------------------------------------------------------------
# Forward kernel: packed (8, T) f32 -> PE -> 13-layer MLP -> packed (8, T).
# ---------------------------------------------------------------------------


def mlp_from_pe(weight_refs, x, d_in, use_new_activation: bool, sigma_only: bool):
    """The 13-layer NeRF MLP on already-encoded inputs; shared by the
    per-point kernel here and the per-ray fused render kernel
    (``ops/fused_render_t.py``).

    weight_refs: the 26 packed operand refs (pack_weights_t order).
    x: (64, T) PE'd xyz in the compute dtype; d_in: (32, T) PE'd dir or None.
    Returns (rgb8 (8, T) f32 rows 0:3 real, sigma8 (8, T) f32 row 0 real);
    rgb8 is None when sigma_only.
    """
    (
        w1, w2, w3, w4, w5h, w5x, w6, w7, w8, wfin, wdh, wdx, wrgb, wsig,
        b1, b2, b3, b4, b5, b6, b7, b8, bfin, bd, brgb, bsig,
    ) = weight_refs
    cd = x.dtype
    act = jax.nn.relu

    def dot(a_ref, b_val):
        return jnp.dot(a_ref[:], b_val, preferred_element_type=jnp.float32)

    h = act(dot(w1, x) + b1[:]).astype(cd)
    h = act(dot(w2, h) + b2[:]).astype(cd)
    h = act(dot(w3, h) + b3[:]).astype(cd)
    h = act(dot(w4, h) + b4[:]).astype(cd)
    h = act(dot(w5h, h) + dot(w5x, x) + b5[:]).astype(cd)
    h = act(dot(w6, h) + b6[:]).astype(cd)
    h = act(dot(w7, h) + b7[:]).astype(cd)
    h = act(dot(w8, h) + b8[:]).astype(cd)

    # head epilogues stay f32: Mosaic cannot legalize bf16 log1p/tanh chains,
    # and these are a small share of the VPU work
    sigma = dot(wsig, h) + bsig[:]  # (8, T); row 0 real, rest zero
    if sigma_only:
        return None, sigma

    f = (dot(wfin, h) + bfin[:]).astype(cd)
    a_d = dot(wdh, f) + dot(wdx, d_in) + bd[:]
    d = (shifted_softplus(a_d) if use_new_activation else act(a_d)).astype(cd)
    rgb = dot(wrgb, d) + brgb[:]  # (8, T); rows 0:3 real
    rgb = widened_sigmoid(rgb) if use_new_activation else jax.nn.sigmoid(rgb)
    return rgb, sigma


def _kernel_t(x_ref, *refs, use_new_activation: bool, sigma_only: bool, cdtype: str):
    weight_refs = refs[:26]
    out_ref = refs[26]

    cd = jnp.bfloat16 if cdtype == "bfloat16" else jnp.float32
    xin = x_ref[:]  # (8, T) f32
    sx, cx = _pe_fwd(xin[0:3], N_FREQS_XYZ)
    x = _pe_concat(xin[0:3], sx, cx, XYZ_PAD - XYZ_CH, cd)  # (64, T)

    if sigma_only:
        _, sigma = mlp_from_pe(weight_refs, x, None, use_new_activation, True)
        out_ref[:] = sigma.astype(out_ref.dtype)  # sigma in row 0
        return

    sd, cdir = _pe_fwd(xin[3:6], N_FREQS_DIR)
    d_in = _pe_concat(xin[3:6], sd, cdir, DIR_PAD - DIR_CH, cd)  # (32, T)
    rgb, sigma = mlp_from_pe(weight_refs, x, d_in, use_new_activation, False)
    t = x_ref.shape[1]
    out_ref[:] = jnp.concatenate(
        [rgb[0:3], sigma[0:1], jnp.zeros((OUT_PAD - 4, t), jnp.float32)], axis=0
    ).astype(out_ref.dtype)


def _forward_t(
    x_packed: jnp.ndarray,
    operands: Tuple[jnp.ndarray, ...],
    use_new_activation: bool,
    sigma_only: bool,
    cdtype: str,
) -> jnp.ndarray:
    n = x_packed.shape[1]
    grid = (n // TILE_T,)

    in_specs = [
        pl.BlockSpec((IN_PAD, TILE_T), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    for op in operands:
        in_specs.append(
            pl.BlockSpec(op.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _kernel_t,
        use_new_activation=use_new_activation,
        sigma_only=sigma_only,
        cdtype=cdtype,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (OUT_PAD, TILE_T), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((OUT_PAD, n), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(x_packed, *operands)


# ---------------------------------------------------------------------------
# Transposed backward kernel: recompute PE + forward, then full backprop in
# VMEM; weight grads accumulated across the sequential grid into shared
# blocks; input grads flow through the exact PE adjoint.
# ---------------------------------------------------------------------------


def _bwd_kernel_t(x_ref, g_ref, *refs, use_new_activation: bool, cdtype: str):
    (
        w1, w2, w3, w4, w5h, w5x, w6, w7, w8, wfin, wdh, wdx, wrgb, wsig,
        b1, b2, b3, b4, b5, b6, b7, b8, bfin, bd, brgb, bsig,
        dw1, dw2, dw3, dw4, dw5h, dw5x, dw6, dw7, dw8, dwfin, dwdh, dwdx,
        dwrgb, dwsig,
        db1, db2, db3, db4, db5, db6, db7, db8, dbfin, dbd, dbrgb, dbsig,
        dx_ref,
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
    xin = x_ref[:]      # (8, T) f32: xyz 0:3, dir 3:6
    g = g_ref[:]        # (8, T) f32: rows 0:3 = d_rgb, row 3 = d_sigma

    sx, cx = _pe_fwd(xin[0:3], N_FREQS_XYZ)
    x = _pe_concat(xin[0:3], sx, cx, XYZ_PAD - XYZ_CH, cd)
    sdir, cdir = _pe_fwd(xin[3:6], N_FREQS_DIR)
    d_in = _pe_concat(xin[3:6], sdir, cdir, DIR_PAD - DIR_CH, cd)

    t = x_ref.shape[1]
    zero5 = jnp.zeros((OUT_PAD - 3, t), jnp.float32)
    zero7 = jnp.zeros((OUT_PAD - 1, t), jnp.float32)
    g_rgb = jnp.concatenate([g[0:3], zero5], axis=0)      # (8, T)
    g_sig_in = jnp.concatenate([g[3:4], zero7], axis=0)   # (8, T)

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
        tt = jnp.tanh(0.5 * a_rgb)
        dact_rgb = 0.25 * (1.0 + 2e-3) * (1.0 - tt * tt)
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

    # input grads through the exact PE adjoint
    dxpe = dot_tn(w1, da1) + dot_tn(w5x, da5)  # (64, T) f32
    dx3 = _pe_bwd(sx, cx, dxpe, N_FREQS_XYZ)
    ddpe = dot_tn(wdx, da_d)  # (32, T) f32
    dd3 = _pe_bwd(sdir, cdir, ddpe, N_FREQS_DIR)
    dx_ref[:] = jnp.concatenate(
        [dx3, dd3, jnp.zeros((IN_PAD - 6, t), jnp.float32)], axis=0
    ).astype(dx_ref.dtype)


def _backward_t(
    x_packed: jnp.ndarray,
    g8: jnp.ndarray,
    operands: Tuple[jnp.ndarray, ...],
    use_new_activation: bool,
    cdtype: str,
):
    n = x_packed.shape[1]
    grid = (n // TILE_BWD_T,)

    in_specs = [
        pl.BlockSpec((IN_PAD, TILE_BWD_T), lambda i: (0, i), memory_space=pltpu.VMEM),
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
        + [jax.ShapeDtypeStruct((IN_PAD, n), jnp.float32)]
    )
    out_specs = (
        [
            pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for s in w_shapes + b_shapes
        ]
        + [
            pl.BlockSpec((IN_PAD, TILE_BWD_T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
    )

    kernel = functools.partial(
        _bwd_kernel_t, use_new_activation=use_new_activation, cdtype=cdtype
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=jax.default_backend() != "tpu",
    )(x_packed, g8, *operands)
    return outs[:14], outs[14:26], outs[26]


def _unpack_grads_t(dws, dbs, params):
    """Transposed padded grads -> reference-order param-pytree grads."""
    import numpy as np

    from sinnerf_tpu.core.encoding import blocked_perm

    (
        dw1, dw2, dw3, dw4, dw5h, dw5x, dw6, dw7, dw8, dwfin, dwdh, dwdx,
        dwrgb, dwsig,
    ) = dws
    (db1, db2, db3, db4, db5, db6, db7, db8, dbfin, dbd, dbrgb, dbsig) = dbs

    inv_x = np.argsort(blocked_perm(3, N_FREQS_XYZ))
    inv_d = np.argsort(blocked_perm(3, N_FREQS_DIR))

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


def _pack_input(
    xyz_t: jnp.ndarray, dir_t: Optional[jnp.ndarray], tile: int
) -> Tuple[jnp.ndarray, int]:
    """(3, N) xyz + optional (3, N) dir -> (8, N_padded) f32 packed block."""
    n = xyz_t.shape[1]
    n_pad = (-n) % tile
    parts = [
        xyz_t.astype(jnp.float32),
        jnp.zeros((3, n), jnp.float32) if dir_t is None else dir_t.astype(jnp.float32),
        jnp.zeros((IN_PAD - 6, n), jnp.float32),
    ]
    x = jnp.concatenate(parts, axis=0)
    if n_pad:
        x = jnp.pad(x, ((0, 0), (0, n_pad)))
    return x, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_nerf_mlp_t(
    params: Dict[str, Any],
    xyz_t: jnp.ndarray,
    dir_t: Optional[jnp.ndarray],
    sigma_only: bool = False,
    use_new_activation: bool = True,
    compute_dtype: str = "float32",
):
    """Fused PE+MLP: raw xyz_t (3, N) f32 and dir_t (3, N) f32 -> (4, N)
    [rgb, sigma] (or (1, N) when sigma_only).  PE runs inside the kernel."""
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    x, n = _pack_input(xyz_t, dir_t, TILE_T)
    operands = pack_weights_t(params, dtype)
    out = _forward_t(x, operands, use_new_activation, sigma_only, compute_dtype)
    if sigma_only:
        return out[0:1, :n]
    return jnp.concatenate([out[0:3, :n], out[3:4, :n]], axis=0)


def _fwd(params, xyz_t, dir_t, sigma_only, use_new_activation, compute_dtype):
    out = fused_nerf_mlp_t(
        params, xyz_t, dir_t, sigma_only, use_new_activation, compute_dtype
    )
    return out, (params, xyz_t, dir_t)


def _bwd(sigma_only, use_new_activation, compute_dtype, residuals, g):
    """Fused transposed backward: recompute PE+fwd + full backprop in one
    kernel.  Residuals are the raw (3, N) inputs — 7.5x smaller than storing
    the PE arrays."""
    params, xyz_t, dir_t = residuals
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    x, n = _pack_input(xyz_t, dir_t, TILE_BWD_T)
    n_tot = x.shape[1]

    g = g.astype(jnp.float32)
    if sigma_only:  # g (1, N): sigma grads only
        g8 = jnp.concatenate(
            [jnp.zeros((3, n), jnp.float32), g, jnp.zeros((OUT_PAD - 4, n), jnp.float32)],
            axis=0,
        )
    else:  # g (4, N): rows 0:3 rgb, row 3 sigma
        g8 = jnp.concatenate([g, jnp.zeros((OUT_PAD - 4, n), jnp.float32)], axis=0)
    g8 = jnp.pad(g8, ((0, 0), (0, n_tot - n)))

    operands = pack_weights_t(params, dtype)
    dws, dbs, dx = _backward_t(x, g8, operands, use_new_activation, compute_dtype)
    params_grad = _unpack_grads_t(dws, dbs, params)
    dxyz = dx[0:3, :n].astype(xyz_t.dtype)
    if dir_t is None:
        return params_grad, dxyz, None
    return params_grad, dxyz, dx[3:6, :n].astype(dir_t.dtype)


fused_nerf_mlp_t.defvjp(_fwd, _bwd)
