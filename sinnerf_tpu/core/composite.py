"""Alpha compositing (volume rendering quadrature).

Reference semantics: the ``inference`` closure in ``models/rendering.py:214-248``
— delta computation with an infinite final interval, scaling by the (non-unit)
ray-direction norm, sigma noise regularization, the exclusive-cumprod
transmittance trick, and optional white-background compositing.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class CompositeOut(NamedTuple):
    rgb: jnp.ndarray      # (N_rays, 3)
    depth: jnp.ndarray    # (N_rays,)
    weights: jnp.ndarray  # (N_rays, N_samples)


def compute_weights(
    sigmas: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    noise_std: float = 0.0,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Per-sample compositing weights ``w_i = alpha_i * prod_{j<i}(1-alpha_j)``.

    sigmas/z_vals: (N_rays, S); rays_d: (N_rays, 3) *unnormalized* — deltas are
    scaled by ``||d||`` to convert to world distance (``rendering.py:220-222``).
    """
    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    delta_inf = jnp.full_like(deltas[..., :1], 1e10)
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)
    deltas = deltas * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    if noise_std > 0.0:
        if key is None:
            raise ValueError("noise_std > 0 requires a PRNG key")
        sigmas = sigmas + noise_std * jax.random.normal(
            key, sigmas.shape, dtype=sigmas.dtype
        )

    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas))
    # Transmittance via exclusive cumprod: T_i = prod_{j<i} (1 - a_j + 1e-10).
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-10], axis=-1
    )
    transmittance = jnp.cumprod(shifted, axis=-1)[..., :-1]
    return alphas * transmittance


def composite(
    rgbs: jnp.ndarray,
    sigmas: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    noise_std: float = 0.0,
    key: Optional[jax.Array] = None,
    white_back: bool = False,
) -> CompositeOut:
    """Composite per-sample radiance into per-ray rgb/depth.

    Matches ``models/rendering.py:241-248``: ``rgb = sum_i w_i * c_i``,
    ``depth = sum_i w_i * z_i``, plus ``rgb += 1 - sum_i w_i`` on white
    backgrounds.
    """
    weights = compute_weights(sigmas, z_vals, rays_d, noise_std, key)
    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    depth = jnp.sum(weights * z_vals, axis=-1)
    if white_back:
        rgb = rgb + (1.0 - jnp.sum(weights, axis=-1, keepdims=True))
    return CompositeOut(rgb=rgb, depth=depth, weights=weights)


def composite_t(
    rgbs_t: jnp.ndarray,
    sigmas: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    noise_std: float = 0.0,
    key: Optional[jax.Array] = None,
    white_back: bool = False,
) -> CompositeOut:
    """Channel-major compositing: rgbs_t (3, N_rays, S) instead of
    (N_rays, S, 3) — avoids the 128-lane padding of a minor dim of 3 on TPU.
    Same math as ``composite``; returns rgb back in (N_rays, 3)."""
    weights = compute_weights(sigmas, z_vals, rays_d, noise_std, key)
    rgb = jnp.sum(weights[None] * rgbs_t, axis=-1).T  # (N, 3)
    depth = jnp.sum(weights * z_vals, axis=-1)
    if white_back:
        rgb = rgb + (1.0 - jnp.sum(weights, axis=-1, keepdims=True))
    return CompositeOut(rgb=rgb, depth=depth, weights=weights)
