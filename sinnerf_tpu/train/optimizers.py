"""Optimizers and epoch-based LR schedules.

Parity targets:
* ``get_optimizer`` — ``utils/__init__.py:11-31`` (sgd / adam / radam /
  ranger, with a ``rate`` factor scaling lr — the discriminator uses 0.2x,
  ``models/sinnerf.py:208``)
* ``get_scheduler`` — ``utils/__init__.py:34-52`` (steplr=MultiStepLR,
  cosine, poly) + ``GradualWarmupScheduler`` (``utils/warmup_scheduler.py``)

The torch schedulers step per epoch; here the schedule is a pure function
``lr_for_epoch(hparams, epoch)`` and the optimizer is built with
``optax.inject_hyperparams`` so the step function can feed the current lr in.
Ranger (RAdam + Lookahead, ``utils/optimizers.py:292-439``) is implemented as
a lookahead wrapper that keeps slow weights in the optimizer state — the
param pytree itself stays plain (torch mutates a ``slow_buffer`` on the fast
weights instead).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


def lr_for_epoch(hparams: Any, epoch: float) -> float:
    """Learning-rate multiplier schedule, epoch-indexed like the reference's
    per-epoch ``scheduler.step()``.  Returns the absolute lr (before any
    optimizer ``rate`` scaling)."""
    sched = getattr(hparams, "lr_scheduler", "steplr")
    num_epochs = getattr(hparams, "num_epochs", 1)

    # GradualWarmupScheduler semantics (warmup_scheduler.py:25-35,53-61):
    # ramp base_lr -> multiplier*base_lr over warmup_epochs, then run the
    # after-scheduler on base_lrs*multiplier stepped with epoch - warmup
    # (milestones shift by the warmup length).  Gated off radam/ranger like
    # get_scheduler (utils/__init__.py:48-51).
    warmup_epochs = getattr(hparams, "warmup_epochs", 0)
    optimizer = getattr(hparams, "optimizer", "adam")
    warmup_on = warmup_epochs > 0 and optimizer not in ("radam", "ranger")
    mult = getattr(hparams, "warmup_multiplier", 1.0)
    if warmup_on and epoch <= warmup_epochs:
        return hparams.lr * (1.0 + (mult - 1.0) * epoch / warmup_epochs)

    lr = hparams.lr * (mult if warmup_on else 1.0)
    # torch's after-scheduler takes its first step one epoch AFTER the ramp
    # ends (the `finished` flag flips during epoch warmup+1's get_lr), so its
    # internal epoch counter is epoch - warmup - 1 (golden-tested vs
    # GradualWarmupScheduler(MultiStepLR))
    eff = epoch - warmup_epochs - 1 if warmup_on else epoch
    if sched == "steplr":
        gamma = getattr(hparams, "decay_gamma", 0.1)
        steps = getattr(hparams, "decay_step", [20])
        lr = lr * gamma ** sum(1 for s in steps if eff >= s)
    elif sched == "cosine":
        import math

        eta_min = 1e-8
        lr = eta_min + (lr - eta_min) * 0.5 * (
            1 + math.cos(math.pi * min(eff, num_epochs) / num_epochs)
        )
    elif sched == "poly":
        exp = getattr(hparams, "poly_exp", 0.9)
        lr = lr * (1 - min(eff, num_epochs) / num_epochs) ** exp
    else:
        raise ValueError(f"unknown scheduler {sched!r}")
    return lr


class LookaheadState(NamedTuple):
    inner: Any
    slow: Any
    count: jnp.ndarray


def lookahead(inner: optax.GradientTransformation, k: int = 6, alpha: float = 0.5):
    """Ranger's lookahead component (utils/optimizers.py:292-439): every k
    steps pull fast weights halfway toward slow weights.  Requires params to
    be passed to ``update`` (optax convention already supplies them)."""

    def init_fn(params):
        return LookaheadState(
            inner=inner.init(params),
            slow=jax.tree_util.tree_map(jnp.copy, params),
            count=jnp.zeros([], jnp.int32),
        )

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("lookahead requires params")
        inner_updates, inner_state = inner.update(updates, state.inner, params)
        count = state.count + 1
        sync = count % k == 0
        fast = optax.apply_updates(params, inner_updates)

        def do_sync(args):
            fast, slow = args
            new_slow = jax.tree_util.tree_map(
                lambda s, f: s + alpha * (f - s), slow, fast
            )
            return new_slow, new_slow

        def no_sync(args):
            fast, slow = args
            return fast, slow

        new_fast, new_slow = jax.lax.cond(sync, do_sync, no_sync, (fast, state.slow))
        # express result as an update relative to current params
        final_updates = jax.tree_util.tree_map(lambda nf, p: nf - p, new_fast, params)
        return final_updates, LookaheadState(inner_state, new_slow, count)

    return optax.GradientTransformation(init_fn, update_fn)


def get_optimizer(hparams: Any, rate: float = 1.0) -> optax.GradientTransformation:
    """Build the optax optimizer named by ``hparams.optimizer``; lr is
    injected per-step (use ``set_lr``)."""
    name = getattr(hparams, "optimizer", "adam")
    wd = getattr(hparams, "weight_decay", 0.0)
    base_lr = hparams.lr * rate
    momentum = getattr(hparams, "momentum", 0.9)

    # weight_decay parity (reference utils/__init__.py:16-28): torch SGD and
    # Adam couple L2 into the gradient BEFORE the momentum/moment updates;
    # the vendored RAdam/Ranger apply a DECOUPLED lr-scaled decay
    # (optimizers.py:92-101 `p -= wd*lr*p`).  optax mirror: decayed weights
    # added before scale_by_adam for adam/sgd, between scale_by_radam and the
    # lr scale for radam/ranger.
    def decayed():
        return [optax.add_decayed_weights(wd)] if wd > 0 else []

    if name == "sgd":
        def make(learning_rate):
            return optax.chain(
                *decayed(), optax.sgd(learning_rate, momentum=momentum)
            )
    elif name == "adam":
        # torch.optim.Adam defaults: eps=1e-8, betas=(0.9, 0.999)
        def make(learning_rate):
            return optax.chain(*decayed(), optax.adam(learning_rate, eps=1e-8))
    elif name == "radam":
        def make(learning_rate):
            return optax.chain(
                optax.scale_by_radam(eps=1e-8),
                *decayed(),
                optax.scale_by_learning_rate(learning_rate),
            )
    elif name == "ranger":
        # The vendored Ranger's betas default to (0.95, 0.999) and the
        # reference's get_optimizer does NOT override them (only lr/eps/wd,
        # utils/__init__.py:26-27 vs optimizers.py:294) — b1 is 0.95 here,
        # unlike RAdam's 0.9.  eps IS overridden to 1e-8.  Golden-tested vs
        # the vendored torch Ranger across the k=6 lookahead sync boundary.
        def make(learning_rate):
            inner = optax.chain(
                optax.scale_by_radam(b1=0.95, eps=1e-8),
                *decayed(),
                optax.scale_by_learning_rate(learning_rate),
            )
            return lookahead(inner, k=6, alpha=0.5)
    else:
        raise ValueError(f"optimizer not recognized: {name}")
    return optax.inject_hyperparams(make)(learning_rate=base_lr)


def set_lr(opt_state, lr: float, rate: float = 1.0):
    """Feed the scheduled lr into an inject_hyperparams state."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr * rate, jnp.float32)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])
