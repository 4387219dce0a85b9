"""Adversarial losses for the PatchGAN branch.

Parity targets in ``models/sinnerf.py``:
* ``GANLoss`` (lsgan/bce vs real/fake targets) — ``:88-121``
* generator losses per ``--dloss`` flavor — ``:445-461``
* discriminator losses per flavor — ``:462-487``
* wgan helper ``compute_loss`` — ``:241-256``

All pure functions of discriminator logits; the D forward itself lives in
``sinnerf_tpu/models/discriminator.py``.  Flavors: ``hinge`` (default,
``opt.py:98``), ``vanilla``, ``relavistic`` [sic], ``wgan``, ``wgan_gp``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gan_ls_loss(pred: jnp.ndarray, target_is_real: bool) -> jnp.ndarray:
    """LSGAN MSE vs a 1/0 target (GANLoss with use_lsgan=True, sinnerf.py:95-96)."""
    target = 1.0 if target_is_real else 0.0
    return jnp.mean((pred - target) ** 2)


def gan_bce_loss(pred: jnp.ndarray, target_is_real: bool) -> jnp.ndarray:
    """BCE-with-logits vs a 1/0 target."""
    target = 1.0 if target_is_real else 0.0
    return jnp.mean(
        jnp.maximum(pred, 0.0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    )


def _wgan_compute_loss(d_out: jnp.ndarray, target: float) -> jnp.ndarray:
    """(2*target - 1) * mean(d_out) (sinnerf.py:241-256, dloss wgan branch)."""
    return (2.0 * target - 1.0) * jnp.mean(d_out)


def g_loss(pred_fake: jnp.ndarray, dloss: str, pred_real: jnp.ndarray = None) -> jnp.ndarray:
    """Generator adversarial loss (sinnerf.py:445-461).

    ``relavistic`` additionally needs the discriminator's output on (augmented)
    real patches.
    """
    if dloss == "hinge":
        return -jnp.mean(pred_fake)
    if dloss == "vanilla":
        return gan_ls_loss(pred_fake, True)
    if dloss == "relavistic":
        if pred_real is None:
            raise ValueError("relavistic g_loss needs pred_real")
        return (
            gan_ls_loss(pred_real - jnp.mean(pred_fake), False)
            + gan_ls_loss(pred_fake - jnp.mean(pred_real), True)
        ) / 2.0
    if dloss in ("wgan", "wgan_gp"):
        return _wgan_compute_loss(pred_fake, 1.0)
    raise NotImplementedError(f"unknown dloss {dloss!r}")


def d_loss(pred_real: jnp.ndarray, pred_fake: jnp.ndarray, dloss: str) -> jnp.ndarray:
    """Discriminator loss on real and (detached) fake logits (sinnerf.py:462-487)."""
    if dloss == "hinge":
        loss_real = jnp.mean(jax.nn.relu(1.0 - pred_real))
        loss_fake = jnp.mean(jax.nn.relu(1.0 + pred_fake))
        return (loss_real + loss_fake) / 2.0
    if dloss == "relavistic":
        return (
            gan_ls_loss(pred_real - jnp.mean(pred_fake), True)
            + gan_ls_loss(pred_fake - jnp.mean(pred_real), False)
        ) / 2.0
    if dloss == "vanilla":
        return (gan_ls_loss(pred_real, True) + gan_ls_loss(pred_fake, False)) / 2.0
    if dloss in ("wgan", "wgan_gp"):
        return _wgan_compute_loss(pred_fake, 0.0) + _wgan_compute_loss(pred_real, 1.0)
    raise NotImplementedError(f"unknown dloss {dloss!r}")
