"""Ray-depth sampling: stratified coarse samples and inverse-CDF importance
resampling.

Reference semantics:
* stratified sampling + perturb jitter — ``models/rendering.py:264-282``
* ``sample_pdf`` importance resampling — ``models/rendering.py:15-61``

TPU-first design notes: ``torch.searchsorted`` becomes a fully vectorized
rank-by-comparison (a ``(N_rays, N_importance, N_bins)`` boolean reduction on
the VPU) — no binary-search loops, no data-dependent control flow, everything
static-shaped and fusible.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def stratified_z_vals(
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    use_disp: bool = False,
    perturb: float = 0.0,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Sample ``n_samples`` depths per ray between ``near`` and ``far``.

    near/far: (N_rays, 1).  Returns (N_rays, n_samples).

    ``use_disp`` samples linearly in disparity (inverse depth); ``perturb > 0``
    jitters each sample uniformly inside its stratum, matching
    ``models/rendering.py:264-282``.
    """
    z_steps = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    if use_disp:
        z_vals = 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)
    else:
        z_vals = near * (1.0 - z_steps) + far * z_steps  # (N_rays, n_samples)

    if perturb > 0.0:
        if key is None:
            raise ValueError("perturb > 0 requires a PRNG key")
        z_mid = 0.5 * (z_vals[..., :-1] + z_vals[..., 1:])
        upper = jnp.concatenate([z_mid, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], z_mid], axis=-1)
        u = perturb * jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * u
    return z_vals


def searchsorted_right(sorted_seq: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Batched ``searchsorted(..., right=True)``: for each value, the count of
    ``sorted_seq`` entries ``<= value`` along the last axis.

    sorted_seq: (..., M) ascending.  values: (..., K).  Returns (..., K) int32.

    Vectorized comparison-rank instead of binary search: with M ~ 64 bins this
    is a tiny VPU reduction and keeps the whole pipeline free of loops.
    """
    return jnp.sum(
        sorted_seq[..., None, :] <= values[..., :, None], axis=-1
    ).astype(jnp.int32)


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_importance: int,
    det: bool = False,
    key: Optional[jax.Array] = None,
    eps: float = 1e-5,
    sorted_u: bool = False,
) -> jnp.ndarray:
    """Draw ``n_importance`` samples from the piecewise distribution given by
    ``weights`` over ``bins``.

    bins: (N_rays, M+1) bin edges (the coarse z midpoints).
    weights: (N_rays, M) unnormalized weights.
    Matches ``models/rendering.py:15-61`` including the eps regularization,
    the right-searchsorted with below/above clamping, and the degenerate-bin
    (denom < eps -> 1) guard.

    ``sorted_u=True`` draws *stratified* uniforms ``(arange(K) + U)/K`` in the
    stochastic case — same marginal coverage, lower variance, and the output
    is per-row sorted so the caller can use an O(n) merge instead of a sort.
    (The reference draws iid uniforms; deviation documented in README.)
    """
    n_rays, m = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (N, M+1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_importance, dtype=bins.dtype)
        u = jnp.broadcast_to(u, (n_rays, n_importance))
    else:
        if key is None:
            raise ValueError("stochastic sample_pdf requires a PRNG key")
        u = jax.random.uniform(key, (n_rays, n_importance), dtype=bins.dtype)
        if sorted_u:
            u = (jnp.arange(n_importance, dtype=bins.dtype) + u) / n_importance

    # Gather-free formulation: per-element lane gathers (take_along_axis) cost
    # ~23 ms each at 16k rays on TPU.  Because cdf AND bins are per-row
    # monotonic, the reference's below/above gathers are exactly masked
    # extrema:  x[below] = max{x[j] : cdf[j] <= u}  (cdf[0]=0 <= u always),
    #           x[above] = min{x[j] : cdf[j] >  u}  (empty -> x[m], matching
    # the clamp of inds to m).  Pure VPU compare/select/reduce — no gathers.
    le = cdf[..., None, :] <= u[..., :, None]  # (N, K, M+1)
    ninf = jnp.array(-jnp.inf, bins.dtype)
    pinf = jnp.array(jnp.inf, bins.dtype)
    cdf_b = jnp.broadcast_to(cdf[..., None, :], le.shape)
    bins_b = jnp.broadcast_to(bins[..., None, :], le.shape)
    cdf_lo = jnp.max(jnp.where(le, cdf_b, ninf), axis=-1)
    bins_lo = jnp.max(jnp.where(le, bins_b, ninf), axis=-1)
    cdf_hi = jnp.min(jnp.where(le, pinf, cdf_b), axis=-1)
    bins_hi = jnp.min(jnp.where(le, pinf, bins_b), axis=-1)
    cdf_hi = jnp.where(jnp.isinf(cdf_hi), cdf[..., -1:], cdf_hi)
    bins_hi = jnp.where(jnp.isinf(bins_hi), bins[..., -1:], bins_hi)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_lo + (u - cdf_lo) / denom * (bins_hi - bins_lo)
