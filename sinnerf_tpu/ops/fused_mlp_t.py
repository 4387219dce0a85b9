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

Backward: custom VJP via the XLA channel-major path's autodiff
(``nerf_apply_t``) — activations recompute; a fully fused transposed backward
kernel is the follow-up (forward is the eval/bench hot path; training grads
remain correct through XLA).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sinnerf_tpu.core.activations import shifted_softplus, widened_sigmoid
from sinnerf_tpu.models.nerf import nerf_apply_t, permute_params_for_blocked_pe

XYZ_CH = 63
XYZ_PAD = 64
DIR_CH = 27
DIR_PAD = 32
WIDTH = 256
HALF = 128
OUT_PAD = 8
TILE_T = 2048  # points (lanes) per grid step


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
        out_ref,
    ) = refs

    x = x_ref[:]  # (64, T)

    def dot(a_ref, b_val):
        return jnp.dot(a_ref[:], b_val, preferred_element_type=jnp.float32)

    act = jax.nn.relu
    cd = x.dtype
    h = act(dot(w1, x) + b1[:]).astype(cd)
    h = act(dot(w2, h) + b2[:]).astype(cd)
    h = act(dot(w3, h) + b3[:]).astype(cd)
    h = act(dot(w4, h) + b4[:]).astype(cd)
    h = act(dot(w5h, h) + dot(w5x, x) + b5[:]).astype(cd)
    h = act(dot(w6, h) + b6[:]).astype(cd)
    h = act(dot(w7, h) + b7[:]).astype(cd)
    h = act(dot(w8, h) + b8[:]).astype(cd)

    sigma = dot(wsig, h) + bsig[:]  # (8, T); row 0 real

    if sigma_only:
        out_ref[:] = sigma.astype(out_ref.dtype)
        return

    f = (dot(wfin, h) + bfin[:]).astype(cd)
    d_in = d_ref[:]  # (32, T)
    a_d = dot(wdh, f) + dot(wdx, d_in) + bd[:]
    d = (shifted_softplus(a_d) if use_new_activation else act(a_d)).astype(cd)
    rgb = dot(wrgb, d) + brgb[:]  # (8, T); rows 0:3 real
    rgb = widened_sigmoid(rgb) if use_new_activation else jax.nn.sigmoid(rgb)

    out = rgb.at[3:4, :].set(sigma[0:1, :])
    out_ref[:] = out.astype(out_ref.dtype)


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
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (OUT_PAD, TILE_T), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((OUT_PAD, n), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(x_t, d_t, *operands)


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
    out = _forward_t(x, d, operands, use_new_activation, sigma_only)
    if sigma_only:
        return out[0:1, :n]
    return out[0:4, :n]


def _fwd(params, xyz_pe_t, dir_pe_t, sigma_only, use_new_activation, compute_dtype):
    out = fused_nerf_mlp_t(
        params, xyz_pe_t, dir_pe_t, sigma_only, use_new_activation, compute_dtype
    )
    return out, (params, xyz_pe_t, dir_pe_t)


def _bwd(sigma_only, use_new_activation, compute_dtype, residuals, g):
    params, xyz_pe_t, dir_pe_t = residuals
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None

    if dir_pe_t is None:
        _, vjp = jax.vjp(
            lambda p, x: nerf_apply_t(
                p, x, None, sigma_only=sigma_only,
                use_new_activation=use_new_activation, compute_dtype=dtype,
            ),
            params,
            xyz_pe_t,
        )
        dp, dx = vjp(g)
        return dp, dx, None
    _, vjp = jax.vjp(
        lambda p, x, d: nerf_apply_t(
            p, x, d, sigma_only=sigma_only,
            use_new_activation=use_new_activation, compute_dtype=dtype,
        ),
        params,
        xyz_pe_t,
        dir_pe_t,
    )
    return vjp(g)


fused_nerf_mlp_t.defvjp(_fwd, _bwd)
