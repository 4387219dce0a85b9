"""Fused inverse-CDF importance resampling + sorted z-merge kernel.

The last two XLA stages of the render hot path (~7ms of a 99ms 65k-ray
render) were ``sample_pdf`` — whose gather-free masked-extrema formulation
materializes (N, K, M) broadcasts in HBM — and the ``jnp.sort`` that merges
the coarse and fine depth sets.  This kernel does both in VMEM with rays on
lanes:

* CDF via a small lower-triangular matmul on the MXU (exclusive prefix sum
  of the pdf rows — one (M+1, M) @ (M, R) contraction instead of a scan);
* the inverse CDF per importance sample with the same masked-extrema
  semantics as ``core/sampling.py::sample_pdf`` (monotonic rows make the
  reference's searchsorted+gather equal to compare/select/reduce);
* a bitonic merge of the two per-row-sorted depth sets (ascending coarse ++
  +inf pad ++ descending-reversed fine is bitonic; log2(L) compare-exchange
  stages via sublane rolls and an index-parity select).

Forward-only by design: the reference detaches the resampled depths
(``models/rendering.py:311-313``) and no parameter reaches them upstream,
so the caller wraps the output in ``stop_gradient``.

Supports the deterministic case (``det=True``: u = linspace, eval parity)
and the stratified-sorted stochastic case (``sorted_u`` of
``core/sampling.py`` — u ascending per row, same marginal coverage as the
reference's iid uniforms).  The iid (``fast_merge=False``) reference path
stays in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sinnerf_tpu.ops.fused_mlp_t import round8

import os

R_TILE_PDF = int(os.environ.get("SINNERF_R_TILE_PDF", "2048"))
EPS = 1e-5  # models/rendering.py:33


def _bitonic_merge_rows(x, L):
    """x (L, R) bitonic along sublanes -> ascending.  L power of two."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    d = L // 2
    while d >= 1:
        # pltpu.roll is cyclic with non-negative shift: -d == L - d
        up = jnp.minimum(x, pltpu.roll(x, L - d, 0))
        down = jnp.maximum(x, pltpu.roll(x, d, 0))
        first = (rows // d) % 2 == 0
        x = jnp.where(first, up, down)
        d //= 2
    return x


def _kernel(*refs, s: int, k: int, det: bool, l_merge: int):
    if det:
        z_ref, w_ref, tri_ref, out_ref, zf_ref = refs
        u_ref = None
    else:
        z_ref, w_ref, u_ref, tri_ref, out_ref, zf_ref = refs

    m = s - 2            # usable weights (reference drops first/last)
    z = z_ref[:]         # (s, R) ascending coarse depths
    w = w_ref[:]         # (s, R) coarse weights
    r = z.shape[1]

    z_mid = 0.5 * (z[0 : s - 1] + z[1:s])        # (m+1, R) bins
    wm = w[1 : s - 1] + EPS                      # (m, R)
    pdf = wm / jnp.sum(wm, axis=0, keepdims=True)

    m_pad = round8(m)
    if m_pad > m:
        pdf = jnp.concatenate(
            [pdf, jnp.zeros((m_pad - m, r), jnp.float32)], axis=0
        )
    # exclusive prefix sum as one small MXU contraction; row j of tri has
    # ones in columns < j, so cdf[0] = 0 (the reference's leading zero)
    cdf_full = jnp.dot(tri_ref[:], pdf, preferred_element_type=jnp.float32)
    cdf = cdf_full[0 : m + 1]                    # (m+1, R)
    cdf_last = cdf[m : m + 1]
    bins_last = z_mid[m : m + 1]

    ninf = jnp.float32(-jnp.inf)
    pinf = jnp.float32(jnp.inf)

    def body(i, _):
        if det:
            # linspace(0, 1, k): guard k == 1 (i/(k-1) would be 0/0; the
            # reference linspace yields [0.0])
            u = (i.astype(jnp.float32) / max(k - 1, 1)) * jnp.ones(
                (1, r), jnp.float32
            )
        else:
            # stratified sorted uniforms: (i + U_i) / K
            u = (i.astype(jnp.float32) + u_ref[pl.ds(i, 1), :]) / k
        le = cdf <= u                            # (m+1, R)
        cdf_lo = jnp.max(jnp.where(le, cdf, ninf), axis=0, keepdims=True)
        bins_lo = jnp.max(jnp.where(le, z_mid, ninf), axis=0, keepdims=True)
        cdf_hi = jnp.min(jnp.where(le, pinf, cdf), axis=0, keepdims=True)
        bins_hi = jnp.min(jnp.where(le, pinf, z_mid), axis=0, keepdims=True)
        cdf_hi = jnp.where(jnp.isinf(cdf_hi), cdf_last, cdf_hi)
        bins_hi = jnp.where(jnp.isinf(bins_hi), bins_last, bins_hi)
        denom = cdf_hi - cdf_lo
        denom = jnp.where(denom < EPS, 1.0, denom)
        # store in REVERSED row order: the merge needs the fine set
        # descending, and Mosaic has no `rev` lowering
        zf_ref[pl.ds(k - 1 - i, 1), :] = (
            bins_lo + (u - cdf_lo) / denom * (bins_hi - bins_lo)
        )
        return 0

    jax.lax.fori_loop(0, k, body, 0)

    # merge: [z asc | +inf pad | z_fine descending] is bitonic
    zf_desc = zf_ref[:][0:k]
    pad = l_merge - s - k
    parts = [z]
    if pad:
        parts.append(jnp.full((pad, r), pinf, jnp.float32))
    parts.append(zf_desc)
    merged = _bitonic_merge_rows(jnp.concatenate(parts, axis=0), l_merge)
    out_ref[:] = merged[0 : s + k]


@functools.partial(jax.jit, static_argnames=("n_importance", "det"))
def fused_sample_pdf_merge(
    z_vals: jnp.ndarray,   # (N, S) ascending coarse depths
    weights: jnp.ndarray,  # (N, S) coarse compositing weights
    n_importance: int,
    u: jnp.ndarray | None = None,  # (N, K) uniforms when det=False
    det: bool = True,
) -> jnp.ndarray:
    """sample_pdf(z_mid, weights[:, 1:-1], K) merged with z_vals -> (N, S+K).

    Equals ``sort(concat(z_vals, sample_pdf(..., det or sorted_u)))`` of
    ``core/sampling.py`` (f32; the CDF is accumulated on the MXU instead of
    a sequential cumsum, so values can differ by ~1 ulp).
    """
    n, s = z_vals.shape
    k = n_importance
    m = s - 2
    m_pad = round8(m)
    l_merge = 1 << (s + k - 1).bit_length()

    n_pad = (-n) % R_TILE_PDF
    z_t = z_vals.T.astype(jnp.float32)
    w_t = weights.T.astype(jnp.float32)
    if n_pad:
        # dummy rays: constant z, zero weights -> uniform pdf, benign output
        z_t = jnp.pad(z_t, ((0, 0), (0, n_pad)), constant_values=1.0)
        w_t = jnp.pad(w_t, ((0, 0), (0, n_pad)), constant_values=0.0)

    mp1_pad = round8(m + 1)
    tri = jnp.asarray(
        np.tril(np.ones((mp1_pad, m_pad), np.float32), k=-1)
    )  # row j: ones in columns < j

    in_specs = [
        pl.BlockSpec((s, R_TILE_PDF), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((s, R_TILE_PDF), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    args = [z_t, w_t]
    if not det:
        if u is None:
            raise ValueError("stochastic fused_sample_pdf_merge requires u")
        u_t = u.T.astype(jnp.float32)
        if n_pad:
            u_t = jnp.pad(u_t, ((0, 0), (0, n_pad)))
        in_specs.append(
            pl.BlockSpec((k, R_TILE_PDF), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(u_t)
    in_specs.append(
        pl.BlockSpec((mp1_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    )
    args.append(tri)

    kernel = functools.partial(_kernel, s=s, k=k, det=det, l_merge=l_merge)
    out = pl.pallas_call(
        kernel,
        grid=((n + n_pad) // R_TILE_PDF,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (s + k, R_TILE_PDF), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((s + k, n + n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((round8(k), R_TILE_PDF), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return out[:, :n].T  # (N, S+K)
