"""Fused NeRF-MLP Pallas TPU kernel.

The renderer's inner loop evaluates a 13-layer MLP on millions of sampled
points per step (SURVEY.md §3.4: ~4.8M evals per training forward set).  As a
plain XLA matmul chain, every layer round-trips its (N, 256) activations
through HBM: ~26 KB of traffic per point against ~550 KFLOPs of compute
(~21 FLOPs/byte) — HBM-bound at <10% MXU utilization.  This kernel keeps the
whole layer chain's activations in VMEM: per point only the 128-float packed
input and the 4-float output touch HBM (>1000 FLOPs/byte — compute-bound).

Layout:
* Input is packed as (N, 128): xyz positional encoding in lanes 0:63, dir
  encoding in lanes 63:90, zeros beyond.  Weight matrices touching the input
  are zero-padded to 128 rows, so the padding is mathematically inert.
* The skip concat (reference ``models/nerf.py:131-134``) is algebraically
  split: ``concat([x, h]) @ W == x @ W_x + h @ W_h`` — no in-kernel concat.
* The direction branch similarly reads the packed input's dir lanes through a
  zero-padded weight.
* All 13 weight matrices live in VMEM for the whole grid (~2.2 MB f32);
  activations per 512-point tile are ~0.5 MB.

Gradients: ``fused_nerf_mlp`` carries a custom VJP whose backward runs the
pure-jnp ``nerf_apply`` VJP (XLA).  Forward-only consumers (eval, val,
benchmark, the D-step's detached render) get the fused kernel; training
defaults to the XLA path end-to-end until the backward kernel lands.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sinnerf_tpu.core.activations import shifted_softplus, widened_sigmoid
from sinnerf_tpu.models.nerf import nerf_apply, permute_params_for_blocked_pe

IN_PAD = 128  # packed input width (63 xyz PE + 27 dir PE + zeros)
XYZ_CH = 63
DIR_CH = 27
WIDTH = 256
HALF = 128
TILE = 2048  # forward points per grid step (amortizes per-step overhead)
TILE_BWD = 1024  # backward tile: 8 recompute activations must fit in VMEM


def _pad_rows(w: jnp.ndarray, rows: int) -> jnp.ndarray:
    return jnp.pad(w, ((0, rows - w.shape[0]), (0, 0)))


def pack_weights(
    params: Dict[str, Any], dtype, pe_layout: str = "reference"
) -> Tuple[jnp.ndarray, ...]:
    """Flatten the NeRF param pytree into the kernel's padded operand list.
    ``pe_layout='blocked'`` permutes the PE-consuming weight rows to match
    ``positional_encoding_blocked`` inputs."""
    if pe_layout == "blocked":
        params = permute_params_for_blocked_pe(params)

    def cvt(x):
        return x.astype(dtype)

    w1 = _pad_rows(params["xyz_encoding_1"]["w"], IN_PAD)  # (128, 256)
    # skip layer 5: (63+256, 256) -> x-part (rows 0:63) + h-part (rows 63:)
    w5 = params["xyz_encoding_5"]["w"]
    w5x = _pad_rows(w5[:XYZ_CH], IN_PAD)
    w5h = w5[XYZ_CH:]
    # dir branch: (256+27, 128) -> h-part (rows 0:256) + dir-part
    wd = params["dir_encoding"]["w"]
    wdh = wd[:WIDTH]
    # dir lanes sit at 63:90 in the packed input
    wdx = jnp.zeros((IN_PAD, HALF), w5.dtype).at[XYZ_CH : XYZ_CH + DIR_CH].set(
        wd[WIDTH:]
    )
    # rgb (128, 3) and sigma (256, 1) -> one padded output head each
    wrgb = jnp.pad(params["rgb"]["w"], ((0, 0), (0, HALF - 3)))  # (128, 128)
    brgb = jnp.pad(params["rgb"]["b"], (0, HALF - 3))
    wsig = jnp.pad(params["sigma"]["w"], ((0, 0), (0, HALF - 1)))  # (256, 128)
    bsig = jnp.pad(params["sigma"]["b"], (0, HALF - 1))

    ws = [
        w1,
        params["xyz_encoding_2"]["w"],
        params["xyz_encoding_3"]["w"],
        params["xyz_encoding_4"]["w"],
        w5h,
        w5x,
        params["xyz_encoding_6"]["w"],
        params["xyz_encoding_7"]["w"],
        params["xyz_encoding_8"]["w"],
        params["xyz_encoding_final"]["w"],
        wdh,
        wdx,
        wrgb,
        wsig,
    ]
    bs = [
        params["xyz_encoding_1"]["b"],
        params["xyz_encoding_2"]["b"],
        params["xyz_encoding_3"]["b"],
        params["xyz_encoding_4"]["b"],
        params["xyz_encoding_5"]["b"],
        params["xyz_encoding_6"]["b"],
        params["xyz_encoding_7"]["b"],
        params["xyz_encoding_8"]["b"],
        params["xyz_encoding_final"]["b"],
        params["dir_encoding"]["b"],
        brgb,
        bsig,
    ]
    return tuple(cvt(w) for w in ws) + tuple(
        b.astype(jnp.float32).reshape(1, -1) for b in bs
    )


def _mlp_kernel(x_ref, *refs, use_new_activation: bool):
    (
        w1, w2, w3, w4, w5h, w5x, w6, w7, w8, wfin, wdh, wdx, wrgb, wsig,
        b1, b2, b3, b4, b5, b6, b7, b8, bfin, bd, brgb, bsig,
        out_ref,
    ) = refs

    x = x_ref[:]  # (T, 128) in compute dtype

    def dot(a, b):
        return jnp.dot(a, b[:], preferred_element_type=jnp.float32)

    act = jax.nn.relu
    h = act(dot(x, w1) + b1[:])
    h = h.astype(x.dtype)
    h = act(dot(h, w2) + b2[:]).astype(x.dtype)
    h = act(dot(h, w3) + b3[:]).astype(x.dtype)
    h = act(dot(h, w4) + b4[:]).astype(x.dtype)
    h = act(dot(h, w5h) + dot(x, w5x) + b5[:]).astype(x.dtype)
    h = act(dot(h, w6) + b6[:]).astype(x.dtype)
    h = act(dot(h, w7) + b7[:]).astype(x.dtype)
    h = act(dot(h, w8) + b8[:]).astype(x.dtype)

    sigma = dot(h, wsig) + bsig[:]  # (T, 128); col 0 is real

    f = (dot(h, wfin) + bfin[:]).astype(x.dtype)  # no activation (nerf.py:76)
    d = dot(f, wdh) + dot(x, wdx) + bd[:]
    d = (shifted_softplus(d) if use_new_activation else jax.nn.relu(d)).astype(
        x.dtype
    )
    rgb = dot(d, wrgb) + brgb[:]  # (T, 128); cols 0:3 real
    rgb = widened_sigmoid(rgb) if use_new_activation else jax.nn.sigmoid(rgb)

    out_ref[:, 0:3] = rgb[:, 0:3].astype(out_ref.dtype)
    out_ref[:, 3:4] = sigma[:, 0:1].astype(out_ref.dtype)


def _fused_forward(
    packed_x: jnp.ndarray,
    operands: Tuple[jnp.ndarray, ...],
    use_new_activation: bool,
) -> jnp.ndarray:
    """packed_x: (N, 128) with N % TILE == 0 -> (N, 4) rgb+sigma."""
    n = packed_x.shape[0]
    grid = (n // TILE,)

    in_specs = [
        pl.BlockSpec((TILE, IN_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    # weights/biases: same full block for every grid step
    for op in operands:
        in_specs.append(
            pl.BlockSpec(op.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(_mlp_kernel, use_new_activation=use_new_activation)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(packed_x, *operands)


def pack_inputs(
    xyz_pe: jnp.ndarray, dir_pe: Optional[jnp.ndarray], dtype
) -> jnp.ndarray:
    """(N, 63) + optional (N, 27) -> (N, 128) packed input."""
    n = xyz_pe.shape[0]
    parts = [xyz_pe]
    if dir_pe is not None:
        parts.append(dir_pe)
        pad = IN_PAD - XYZ_CH - DIR_CH
    else:
        pad = IN_PAD - XYZ_CH
    parts.append(jnp.zeros((n, pad), xyz_pe.dtype))
    return jnp.concatenate(parts, axis=-1).astype(dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def fused_nerf_mlp(
    params: Dict[str, Any],
    xyz_pe: jnp.ndarray,
    dir_pe: Optional[jnp.ndarray],
    sigma_only: bool = False,
    use_new_activation: bool = True,
    compute_dtype: str = "float32",
    pe_layout: str = "reference",
):
    """Pallas-fused equivalent of ``nerf_apply`` on pre-embedded inputs.

    xyz_pe: (N, 63); dir_pe: (N, 27) or None (sigma_only).
    Returns (N, 4) rgb+sigma, or (N, 1) sigma when sigma_only.
    ``pe_layout='blocked'`` expects positional_encoding_blocked inputs.
    """
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    n = xyz_pe.shape[0]
    n_pad = (-n) % TILE
    x = pack_inputs(xyz_pe, dir_pe, dtype)
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
    operands = pack_weights(params, dtype, pe_layout)
    out = _fused_forward(x, operands, use_new_activation)[:n]
    if sigma_only:
        return out[:, 3:4]
    return out


# ---------------------------------------------------------------------------
# Backward kernel: recompute-forward + full backprop, all in VMEM.
# Weight grads accumulate across the sequential TPU grid into shared output
# blocks (every grid step maps to block (0, 0); initialized at step 0).
# ---------------------------------------------------------------------------

def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _mlp_bwd_kernel(x_ref, g_ref, *refs, use_new_activation: bool):
    (
        w1, w2, w3, w4, w5h, w5x, w6, w7, w8, wfin, wdh, wdx, wrgb, wsig,
        b1, b2, b3, b4, b5, b6, b7, b8, bfin, bd, brgb, bsig,
        # outputs: weight grads, bias grads, input grad
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

    x = x_ref[:]
    g = g_ref[:]  # (T, 4): cols 0:3 = d rgb, col 3 = d sigma

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def dot_nt(a, b):
        """a @ b.T with f32 accumulation."""
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def dot_tn(a, b):
        """a.T @ b with f32 accumulation."""
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    act = jax.nn.relu
    cd = x.dtype

    # ---- recompute forward, keeping activations in registers/VMEM ---------
    h1 = act(dot(x, w1[:]) + b1[:]).astype(cd)
    h2 = act(dot(h1, w2[:]) + b2[:]).astype(cd)
    h3 = act(dot(h2, w3[:]) + b3[:]).astype(cd)
    h4 = act(dot(h3, w4[:]) + b4[:]).astype(cd)
    h5 = act(dot(h4, w5h[:]) + dot(x, w5x[:]) + b5[:]).astype(cd)
    h6 = act(dot(h5, w6[:]) + b6[:]).astype(cd)
    h7 = act(dot(h6, w7[:]) + b7[:]).astype(cd)
    h8 = act(dot(h7, w8[:]) + b8[:]).astype(cd)
    f = (dot(h8, wfin[:]) + bfin[:]).astype(cd)
    a_d = dot(f, wdh[:]) + dot(x, wdx[:]) + bd[:]
    d = (shifted_softplus(a_d) if use_new_activation else act(a_d)).astype(cd)
    a_rgb = dot(d, wrgb[:]) + brgb[:]

    # ---- output heads ------------------------------------------------------
    # g_rgb lives in lanes 0:3 of a (T, 128) buffer (pad lanes carry zeros)
    zeros_t128 = jnp.zeros((x.shape[0], HALF), jnp.float32)
    g_rgb = zeros_t128.at[:, 0:3].set(g[:, 0:3])
    if use_new_activation:
        # widened_sigmoid'(a) = 0.25 * (1 + 2e-3) * (1 - tanh^2(a/2))
        t = jnp.tanh(0.5 * a_rgb)
        d_act = 0.25 * (1.0 + 2e-3) * (1.0 - t * t)
    else:
        s = _sigmoid(a_rgb)
        d_act = s * (1.0 - s)
    da_rgb = (g_rgb * d_act).astype(cd)

    dwrgb[:] += dot_tn(d, da_rgb)
    dbrgb[:] += jnp.sum(da_rgb, axis=0, keepdims=True)
    dd = dot_nt(da_rgb, wrgb[:])

    # shifted_softplus'(a) = sigmoid(a - 1)
    dssp = _sigmoid(a_d - 1.0) if use_new_activation else (a_d > 0)
    da_d = (dd * dssp).astype(cd)
    dwdh[:] += dot_tn(f, da_d)
    dwdx[:] += dot_tn(x, da_d)
    dbd[:] += jnp.sum(da_d, axis=0, keepdims=True)
    df = dot_nt(da_d, wdh[:]).astype(cd)

    dwfin[:] += dot_tn(h8, df)
    dbfin[:] += jnp.sum(df, axis=0, keepdims=True)
    dh8 = dot_nt(df, wfin[:])

    # sigma head: grads arrive in lane 0 of a (T, 128) buffer
    g_sig = zeros_t128.at[:, 0:1].set(g[:, 3:4]).astype(cd)
    dwsig[:] += dot_tn(h8, g_sig)
    dbsig[:] += jnp.sum(g_sig, axis=0, keepdims=True)
    dh8 = (dh8 + dot_nt(g_sig, wsig[:])).astype(cd)

    # ---- trunk backprop ----------------------------------------------------
    da8 = (dh8 * (h8 > 0)).astype(cd)
    dw8[:] += dot_tn(h7, da8)
    db8[:] += jnp.sum(da8, axis=0, keepdims=True)
    da7 = (dot_nt(da8, w8[:]) * (h7 > 0)).astype(cd)
    dw7[:] += dot_tn(h6, da7)
    db7[:] += jnp.sum(da7, axis=0, keepdims=True)
    da6 = (dot_nt(da7, w7[:]) * (h6 > 0)).astype(cd)
    dw6[:] += dot_tn(h5, da6)
    db6[:] += jnp.sum(da6, axis=0, keepdims=True)
    da5 = (dot_nt(da6, w6[:]) * (h5 > 0)).astype(cd)
    dw5h[:] += dot_tn(h4, da5)
    dw5x[:] += dot_tn(x, da5)
    db5[:] += jnp.sum(da5, axis=0, keepdims=True)
    da4 = (dot_nt(da5, w5h[:]) * (h4 > 0)).astype(cd)
    dw4[:] += dot_tn(h3, da4)
    db4[:] += jnp.sum(da4, axis=0, keepdims=True)
    da3 = (dot_nt(da4, w4[:]) * (h3 > 0)).astype(cd)
    dw3[:] += dot_tn(h2, da3)
    db3[:] += jnp.sum(da3, axis=0, keepdims=True)
    da2 = (dot_nt(da3, w3[:]) * (h2 > 0)).astype(cd)
    dw2[:] += dot_tn(h1, da2)
    db2[:] += jnp.sum(da2, axis=0, keepdims=True)
    da1 = (dot_nt(da2, w2[:]) * (h1 > 0)).astype(cd)
    dw1[:] += dot_tn(x, da1)
    db1[:] += jnp.sum(da1, axis=0, keepdims=True)

    # ---- input grad (packed 128 lanes: xyz PE + dir PE) -------------------
    dx = dot_nt(da1, w1[:]) + dot_nt(da5, w5x[:]) + dot_nt(da_d, wdx[:])
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _fused_backward(
    packed_x: jnp.ndarray,
    packed_g: jnp.ndarray,
    operands: Tuple[jnp.ndarray, ...],
    use_new_activation: bool,
):
    """packed_x: (N, 128); packed_g: (N, 4) [d_rgb | d_sigma].
    Returns (weight grads tuple (f32), bias grads tuple (f32), dx (N, 128))."""
    n = packed_x.shape[0]
    grid = (n // TILE_BWD,)

    in_specs = [
        pl.BlockSpec((TILE_BWD, IN_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_BWD, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for op in operands:
        in_specs.append(
            pl.BlockSpec(op.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    # grad outputs share block (0, 0) across the sequential grid (accumulate)
    w_shapes = [op.shape for op in operands[:14]]
    b_shapes = [op.shape for op in operands[14:]]
    out_shapes = (
        [jax.ShapeDtypeStruct(s, jnp.float32) for s in w_shapes]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in b_shapes]
        + [jax.ShapeDtypeStruct((n, IN_PAD), jnp.float32)]
    )
    out_specs = (
        [
            pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for s in w_shapes + b_shapes
        ]
        + [pl.BlockSpec((TILE_BWD, IN_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    )

    kernel = functools.partial(_mlp_bwd_kernel, use_new_activation=use_new_activation)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=jax.default_backend() != "tpu",
    )(packed_x, packed_g, *operands)
    return outs[:14], outs[14:26], outs[26]


def _unpack_param_grads(dws, dbs, dx, n, sigma_only):
    """Map the kernel's padded grad operands back onto the param pytree and
    split dx into (dxyz_pe, ddir_pe)."""
    (
        dw1, dw2, dw3, dw4, dw5h, dw5x, dw6, dw7, dw8, dwfin, dwdh, dwdx,
        dwrgb, dwsig,
    ) = dws
    (db1, db2, db3, db4, db5, db6, db7, db8, dbfin, dbd, dbrgb, dbsig) = dbs

    params_grad = {
        "xyz_encoding_1": {"w": dw1[:XYZ_CH], "b": db1[0]},
        "xyz_encoding_2": {"w": dw2, "b": db2[0]},
        "xyz_encoding_3": {"w": dw3, "b": db3[0]},
        "xyz_encoding_4": {"w": dw4, "b": db4[0]},
        "xyz_encoding_5": {
            "w": jnp.concatenate([dw5x[:XYZ_CH], dw5h], axis=0),
            "b": db5[0],
        },
        "xyz_encoding_6": {"w": dw6, "b": db6[0]},
        "xyz_encoding_7": {"w": dw7, "b": db7[0]},
        "xyz_encoding_8": {"w": dw8, "b": db8[0]},
        "xyz_encoding_final": {"w": dwfin, "b": dbfin[0]},
        "dir_encoding": {
            "w": jnp.concatenate(
                [dwdh, dwdx[XYZ_CH : XYZ_CH + DIR_CH]], axis=0
            ),
            "b": dbd[0],
        },
        "rgb": {"w": dwrgb[:, 0:3], "b": dbrgb[0, 0:3]},
        "sigma": {"w": dwsig[:, 0:1], "b": dbsig[0, 0:1]},
    }
    dxyz = dx[:n, :XYZ_CH]
    ddir = None if sigma_only else dx[:n, XYZ_CH : XYZ_CH + DIR_CH]
    return params_grad, dxyz, ddir


def _unpermute_blocked_grads(params_grad):
    """pack_weights permuted PE-consuming weight rows for the blocked layout;
    map the accumulated grads back to reference row order
    (dW_ref = dW_blocked[argsort(perm)])."""
    import numpy as np

    from sinnerf_tpu.core.encoding import blocked_perm

    inv_x = np.argsort(blocked_perm(3, 10))
    inv_d = np.argsort(blocked_perm(3, 4))
    out = dict(params_grad)
    out["xyz_encoding_1"] = {
        "w": params_grad["xyz_encoding_1"]["w"][inv_x],
        "b": params_grad["xyz_encoding_1"]["b"],
    }
    w5 = params_grad["xyz_encoding_5"]["w"]
    out["xyz_encoding_5"] = {
        "w": jnp.concatenate([w5[:XYZ_CH][inv_x], w5[XYZ_CH:]]),
        "b": params_grad["xyz_encoding_5"]["b"],
    }
    wd = params_grad["dir_encoding"]["w"]
    out["dir_encoding"] = {
        "w": jnp.concatenate([wd[:WIDTH], wd[WIDTH:][inv_d]]),
        "b": params_grad["dir_encoding"]["b"],
    }
    return out


def _reference_apply(params, xyz_pe, dir_pe, sigma_only, use_new_activation, compute_dtype):
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    return nerf_apply(
        params,
        xyz_pe,
        dir_pe,
        sigma_only=sigma_only,
        use_new_activation=use_new_activation,
        compute_dtype=dtype,
    )


def _fwd(params, xyz_pe, dir_pe, sigma_only, use_new_activation, compute_dtype, pe_layout):
    out = fused_nerf_mlp(
        params, xyz_pe, dir_pe, sigma_only, use_new_activation, compute_dtype,
        pe_layout,
    )
    return out, (params, xyz_pe, dir_pe)


def _bwd(sigma_only, use_new_activation, compute_dtype, pe_layout, residuals, g):
    """Pallas recompute-backward: forward activations are rebuilt in VMEM and
    the full backprop (weight, bias, and input grads) runs in one kernel with
    grid-accumulated weight-grad blocks."""
    params, xyz_pe, dir_pe = residuals
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    n = xyz_pe.shape[0]
    n_pad = (-n) % TILE
    x = pack_inputs(xyz_pe, dir_pe, dtype)
    if sigma_only:
        packed_g = jnp.concatenate(
            [jnp.zeros((n, 3), jnp.float32), g.astype(jnp.float32)], axis=-1
        )
    else:
        packed_g = g.astype(jnp.float32)
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
        packed_g = jnp.pad(packed_g, ((0, n_pad), (0, 0)))
    operands = pack_weights(params, dtype, pe_layout)
    dws, dbs, dx = _fused_backward(x, packed_g, operands, use_new_activation)
    params_grad, dxyz, ddir = _unpack_param_grads(dws, dbs, dx, n, sigma_only)
    if pe_layout == "blocked":
        params_grad = _unpermute_blocked_grads(params_grad)
    # cast grads to the param dtypes
    params_grad = jax.tree_util.tree_map(
        lambda gv, pv: gv.astype(pv.dtype), params_grad, params
    )
    if dir_pe is None:
        return params_grad, dxyz.astype(xyz_pe.dtype), None
    return params_grad, dxyz.astype(xyz_pe.dtype), ddir.astype(dir_pe.dtype)


fused_nerf_mlp.defvjp(_fwd, _bwd)
