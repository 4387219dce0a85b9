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
from sinnerf_tpu.models.nerf import nerf_apply

IN_PAD = 128  # packed input width (63 xyz PE + 27 dir PE + zeros)
XYZ_CH = 63
DIR_CH = 27
WIDTH = 256
HALF = 128
TILE = 512  # points per grid step


def _pad_rows(w: jnp.ndarray, rows: int) -> jnp.ndarray:
    return jnp.pad(w, ((0, rows - w.shape[0]), (0, 0)))


def pack_weights(params: Dict[str, Any], dtype) -> Tuple[jnp.ndarray, ...]:
    """Flatten the NeRF param pytree into the kernel's padded operand list."""
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
    jax.custom_vjp, nondiff_argnums=(3, 4, 5)
)
def fused_nerf_mlp(
    params: Dict[str, Any],
    xyz_pe: jnp.ndarray,
    dir_pe: Optional[jnp.ndarray],
    sigma_only: bool = False,
    use_new_activation: bool = True,
    compute_dtype: str = "float32",
):
    """Pallas-fused equivalent of ``nerf_apply`` on pre-embedded inputs.

    xyz_pe: (N, 63); dir_pe: (N, 27) or None (sigma_only).
    Returns (N, 4) rgb+sigma, or (N, 1) sigma when sigma_only.
    """
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    n = xyz_pe.shape[0]
    n_pad = (-n) % TILE
    x = pack_inputs(xyz_pe, dir_pe, dtype)
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
    operands = pack_weights(params, dtype)
    out = _fused_forward(x, operands, use_new_activation)[:n]
    if sigma_only:
        return out[:, 3:4]
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


def _fwd(params, xyz_pe, dir_pe, sigma_only, use_new_activation, compute_dtype):
    out = fused_nerf_mlp(
        params, xyz_pe, dir_pe, sigma_only, use_new_activation, compute_dtype
    )
    return out, (params, xyz_pe, dir_pe)


def _bwd(sigma_only, use_new_activation, compute_dtype, residuals, g):
    params, xyz_pe, dir_pe = residuals
    # Backward falls back to the XLA path's VJP (recompute-forward); the
    # Pallas backward kernel is future work.
    if dir_pe is None:
        _, vjp = jax.vjp(
            lambda p, x: _reference_apply(
                p, x, None, sigma_only, use_new_activation, compute_dtype
            ),
            params,
            xyz_pe,
        )
        dp, dx = vjp(g)
        return dp, dx, None
    _, vjp = jax.vjp(
        lambda p, x, d: _reference_apply(
            p, x, d, sigma_only, use_new_activation, compute_dtype
        ),
        params,
        xyz_pe,
        dir_pe,
    )
    return vjp(g)


fused_nerf_mlp.defvjp(_fwd, _bwd)
