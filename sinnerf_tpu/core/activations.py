"""Activation functions used by the NeRF heads.

Reference semantics: ``models/activations.py:8-35`` — the reference training
recipes always construct ``NeRF(use_new_activation=True)``
(``models/sinnerf.py:137-141``), which swaps the direction-branch ReLU for
``shifted_softplus`` and the RGB sigmoid for ``widened_sigmoid``.
"""

from __future__ import annotations

import jax.numpy as jnp


def widened_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """``0.5 * (1 + (1 + 2*eps) * tanh(0.5 * x))`` — a sigmoid widened to
    range ``[-eps, 1 + eps]`` so RGB outputs can saturate to exact 0/1.

    Matches ``models/activations.py:8-20``.
    """
    scale = 1.0 + 2.0 * eps
    return 0.5 * (1.0 + scale * jnp.tanh(0.5 * x))


def shifted_softplus(x: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable ``softplus(x - 1)``.

    Matches ``models/activations.py:23-35`` which computes
    ``log1p(exp(-|x-1|)) + (x-1) * (x-1 >= 0)``.
    """
    sx = x - 1.0
    return jnp.log1p(jnp.exp(-jnp.abs(sx))) + jnp.maximum(sx, 0.0)
