"""PatchGAN discriminator as pure functions with explicit spectral-norm state.

Parity target: ``models/discriminator.py:57-171`` — a DCGAN-style conv stack
keyed on ``imsize`` (128/64/32/else-16 branches), spectral norm on every conv,
InstanceNorm (no affine), LeakyReLU(0.2), DiffAugment applied internally with
probability 0.5, optional conditional head with a scale embedding.

TPU-first notes: spectral norm's power-iteration buffer (a mutable torch
buffer) becomes explicit ``(params, sn_state) -> (logits, new_sn_state)``
threading; convolutions are ``lax.conv_general_dilated`` in NCHW which XLA
maps onto the MXU.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from sinnerf_tpu.core.encoding import positional_encoding
from sinnerf_tpu.models.diffaug import diff_augment

Params = Dict[str, Any]


def _conv_spec(imsize: int, ndf: int, nc: int = 3, final_dim: int = 1):
    """(in_ch, out_ch, norm?) per layer, matching the imsize branches at
    discriminator.py:87-154.  All convs are 4x4; every layer except the last
    uses stride 2 pad 1; the last is stride 1 pad 0."""
    if imsize == 128:
        spec = [
            (nc, ndf // 2, False),
            (ndf // 2, ndf, True),
            (ndf, ndf * 2, True),
            (ndf * 2, ndf * 4, True),
        ]
    elif imsize == 64:
        spec = [
            (nc, ndf, False),
            (ndf, ndf * 2, True),
            (ndf * 2, ndf * 4, True),
        ]
    elif imsize == 32:
        spec = [
            (nc, ndf * 2, True),
            (ndf * 2, ndf * 4, True),
        ]
    else:
        spec = [(nc, ndf * 4, True)]
    spec += [
        (ndf * 4, ndf * 8, True),
        (ndf * 8, final_dim, False),  # final conv: stride 1, pad 0
    ]
    return spec


def init_discriminator(
    key: jax.Array,
    imsize: int,
    ndf: int = 64,
    conditional: bool = False,
) -> Tuple[Params, Params]:
    """Build (params, sn_state).  sn_state holds the power-iteration ``u``
    vector per spectrally-normalized conv."""
    final_dim = ndf if conditional else 1
    spec = _conv_spec(imsize, ndf, final_dim=final_dim)
    params: Params = {"convs": []}
    sn_state: Params = {"convs": []}
    keys = jax.random.split(key, len(spec) + 4)
    for i, (cin, cout, _) in enumerate(spec):
        fan_in = cin * 16
        bound = 1.0 / math.sqrt(fan_in)
        w = jax.random.uniform(
            keys[i], (cout, cin, 4, 4), jnp.float32, -bound, bound
        )
        params["convs"].append({"w": w})
        sn_state["convs"].append(
            {"u": jax.random.normal(jax.random.fold_in(keys[i], 1), (cout,))}
        )
    if conditional:
        # 1x1 conv head over [features, scale-embedding] (discriminator.py:70-82)
        emb_ch = 1 * (2 * 4 + 1)  # Embedding(1, 4)
        head_spec = [(ndf + emb_ch, ndf), (ndf, ndf), (ndf, 1)]
        params["head"] = []
        sn_state["head"] = []
        for i, (cin, cout) in enumerate(head_spec):
            bound = 1.0 / math.sqrt(cin)
            w = jax.random.uniform(
                keys[len(spec) + i], (cout, cin, 1, 1), jnp.float32, -bound, bound
            )
            params["head"].append({"w": w})
            sn_state["head"].append(
                {"u": jax.random.normal(jax.random.fold_in(keys[len(spec) + i], 1), (cout,))}
            )
    return params, sn_state


def import_torch_discriminator_state(
    state_dict: Dict[str, Any], prefix: str = ""
) -> Tuple[Params, Params]:
    """Convert the reference ``Discriminator`` torch state into
    ``(params, sn_state)``.

    torch ``spectral_norm`` stores each conv as ``main.<i>.weight_orig`` plus
    the power-iteration buffers ``weight_u``/``weight_v``
    (``/root/reference/models/discriminator.py:57-171``); InstanceNorm has no
    parameters.  Layout is OIHW on both sides.  ``prefix`` strips a ckpt
    namespace like ``"D."``.
    """
    import numpy as np

    state = {
        k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)
    }

    def grab(group: str):
        idxs = sorted(
            int(k.split(".")[1])
            for k in state
            if k.startswith(group + ".") and k.endswith(".weight_orig")
        )
        convs, us = [], []
        for i in idxs:
            # copy=True: torch state_dict tensors share memory with the live
            # module, and spectral norm mutates u IN PLACE on every train
            # forward — a zero-copy jnp view would silently change under us
            w = np.array(state[f"{group}.{i}.weight_orig"], copy=True)
            u = np.array(state[f"{group}.{i}.weight_u"], copy=True)
            convs.append({"w": jnp.asarray(w)})
            us.append({"u": jnp.asarray(u)})
        return convs, us

    convs, us = grab("main")
    if not convs:
        raise KeyError("no main.<i>.weight_orig keys found in state_dict")
    params: Params = {"convs": convs}
    sn_state: Params = {"convs": us}
    head, head_u = grab("final")
    if head:
        params["head"] = head
        sn_state["head"] = head_u
    return params, sn_state


def _torch_main_slots(imsize: int, ndf: int = 64):
    """nn.Sequential slot index of each spectral-norm conv in the reference's
    ``main`` stack (discriminator.py:87-156): every conv is followed by
    InstanceNorm (when normed) + LeakyReLU, except the final conv which ends
    the stack."""
    spec = _conv_spec(imsize, ndf)
    slots, slot = [], 0
    for i, (_, _, norm) in enumerate(spec):
        slots.append(slot)
        slot += 1 + (1 if norm else 0)
        if i != len(spec) - 1:
            slot += 1  # LeakyReLU
    return slots


def export_torch_discriminator_state(
    params: Params,
    sn_state: Params,
    imsize: int = 64,
    ndf: int = 64,
    prefix: str = "",
) -> Dict[str, Any]:
    """Inverse of :func:`import_torch_discriminator_state`: emit the torch
    ``spectral_norm`` state-dict layout ``{prefix}main.<slot>.weight_orig /
    weight_u / weight_v`` (numpy values, OIHW).

    ``weight_v`` is not tracked on our side (the power iteration recomputes
    it from ``(W, u)`` each forward); reconstruct it exactly as torch's
    ``SpectralNorm.compute_weight`` would on the next step:
    ``v = normalize(W_mat^T u, eps=1e-12)``.
    """
    import numpy as np

    out: Dict[str, Any] = {}

    def emit(group: str, slots, convs, us):
        if len(convs) != len(slots):
            raise ValueError(
                f"{group}: {len(convs)} convs but {len(slots)} torch slots "
                f"for imsize={imsize} — wrong imsize?"
            )
        for slot, conv, ust in zip(slots, convs, us):
            w = np.asarray(conv["w"], np.float32)
            u = np.asarray(ust["u"], np.float32)
            v = w.reshape(w.shape[0], -1).T @ u
            v = v / max(float(np.linalg.norm(v)), 1e-12)
            out[f"{prefix}{group}.{slot}.weight_orig"] = w
            out[f"{prefix}{group}.{slot}.weight_u"] = u
            out[f"{prefix}{group}.{slot}.weight_v"] = v.astype(np.float32)

    emit("main", _torch_main_slots(imsize, ndf), params["convs"], sn_state["convs"])
    if "head" in params:
        # conditional head (discriminator.py:74-81): LReLU, SN, LReLU, SN,
        # LReLU, SN -> convs at slots 1/3/5
        emit("final", (1, 3, 5), params["head"], sn_state["head"])
    return out


def _spectral_norm(
    w: jnp.ndarray, u: jnp.ndarray, update: bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One torch-style power iteration: v = normalize(W^T u); u' =
    normalize(W v); sigma = u'^T W v; returns (W / sigma, u').

    Gradient semantics match torch.nn.utils.spectral_norm: u and v are
    buffers (detached), but sigma = u^T W v stays in the graph, so
    d(W/sigma)/dW carries the -(u v^T) <g, W> / sigma^2 norm-restoring
    term.  (An earlier version stop_gradient'ed sigma itself, silently
    dropping that term from every D weight gradient.)

    ``update=False`` recomputes v from the current weight instead of
    torch's stored-v eval buffer (we persist only u); only reachable from
    tests — the train step always advances the power iteration."""
    w2d = w.reshape(w.shape[0], -1)

    def norm(v):
        return v / (jnp.linalg.norm(v) + 1e-12)

    if update:
        v = norm(w2d.T @ u)
        u_new = norm(w2d @ v)
    else:
        v = norm(w2d.T @ u)
        u_new = u
    # u/v are buffers, not part of the training objective
    v = jax.lax.stop_gradient(v)
    u_new = jax.lax.stop_gradient(u_new)
    sigma = u_new @ (w2d @ v)
    return w / sigma, u_new


def _conv(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = jnp.mean(x, axis=(2, 3), keepdims=True)
    var = jnp.var(x, axis=(2, 3), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def discriminator_apply(
    params: Params,
    sn_state: Params,
    x: jnp.ndarray,
    key: Optional[jax.Array] = None,
    y: Optional[jnp.ndarray] = None,
    policy: str = "color,cutout",
    train: bool = True,
    ndf: int = 64,
    imsize: int = 64,
) -> Tuple[jnp.ndarray, Params]:
    """Forward (N, 3, H, W) -> logits.  Applies DiffAugment internally with
    probability 0.5 when a key is given (discriminator.py:159-160); returns
    (logits, new_sn_state)."""
    if key is not None and policy:
        k_coin, k_aug = jax.random.split(key)
        augmented = diff_augment(x, k_aug, policy)
        apply_aug = jax.random.bernoulli(k_coin, 0.5)
        x = jnp.where(apply_aug, augmented, x)

    conditional = "head" in params
    spec = _conv_spec(imsize, ndf, final_dim=ndf if conditional else 1)
    new_sn = {"convs": []}
    h = x
    n_layers = len(spec)
    for i, (cin, cout, use_norm) in enumerate(spec):
        w_sn, u_new = _spectral_norm(
            params["convs"][i]["w"], sn_state["convs"][i]["u"], update=train
        )
        new_sn["convs"].append({"u": u_new})
        last = i == n_layers - 1
        h = _conv(h, w_sn, stride=1 if last else 2, padding=0 if last else 1)
        if not last:
            if use_norm:
                h = _instance_norm(h)
            h = jax.nn.leaky_relu(h, 0.2)

    if conditional:
        if y is None:
            raise ValueError("conditional discriminator needs y")
        h = jax.nn.leaky_relu(h, 0.2)
        emb = positional_encoding(y.reshape(-1, 1), 4)  # (N, 9)
        emb = emb[:, :, None, None]
        h = jnp.concatenate([h, jnp.broadcast_to(emb, emb.shape[:2] + h.shape[2:])], axis=1)
        new_sn["head"] = []
        for i, layer in enumerate(params["head"]):
            w_sn, u_new = _spectral_norm(
                layer["w"], sn_state["head"][i]["u"], update=train
            )
            new_sn["head"].append({"u": u_new})
            h = _conv(h, w_sn, stride=1, padding=0)
            if i < len(params["head"]) - 1:
                h = jax.nn.leaky_relu(h, 0.2)
        h = h.reshape(-1)

    return h, new_sn
