"""DINO ViT-S/16 forward pass in JAX (semantic-consistency branch).

Parity target: ``models/extractor.py`` (``VitExtractor`` wrapping
``torch.hub.load('facebookresearch/dino', 'dino_vits16')``).  The training
loss uses only the **final block's CLS token** of a frozen ViT
(``models/sinnerf.py:162-169``): inputs are nearest-resized to 224, ImageNet
normalized, and the feature is the block-12 output at token 0 — *before* the
final LayerNorm (the reference reads forward hooks on blocks, not the normed
head output).

Architecture: patch 16, embed 384, 12 pre-norm blocks, 6 heads, MLP ratio 4,
qkv bias.  Weights load from a local torch checkpoint via
``import_torch_vit_state`` (torch.hub needs network access, which the
training environment may not have — the dependency is explicit here).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import numpy as np
import jax.numpy as jnp

EMBED_DIM = 384
DEPTH = 12
NUM_HEADS = 6
PATCH = 16
MLP_RATIO = 4
IMG_SIZE = 224
N_TOKENS = (IMG_SIZE // PATCH) ** 2 + 1  # 197

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

Params = Dict[str, Any]


def _linear_init(key, fan_in, fan_out):
    bound = 1.0 / math.sqrt(fan_in)
    wk, bk = jax.random.split(key)
    return {
        "w": jax.random.uniform(wk, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(bk, (fan_out,), jnp.float32, -bound, bound),
    }


def init_vit_params(key: jax.Array) -> Params:
    keys = jax.random.split(key, DEPTH + 3)
    params: Params = {
        "patch_embed": {
            "w": jax.random.normal(keys[0], (EMBED_DIM, 3, PATCH, PATCH)) * 0.02,
            "b": jnp.zeros((EMBED_DIM,)),
        },
        "cls_token": jax.random.normal(keys[1], (1, 1, EMBED_DIM)) * 0.02,
        "pos_embed": jax.random.normal(keys[2], (1, N_TOKENS, EMBED_DIM)) * 0.02,
        "blocks": [],
    }
    for i in range(DEPTH):
        k = jax.random.split(keys[3 + i % (DEPTH)], 6)
        params["blocks"].append(
            {
                "norm1": {"g": jnp.ones(EMBED_DIM), "b": jnp.zeros(EMBED_DIM)},
                "qkv": _linear_init(k[0], EMBED_DIM, 3 * EMBED_DIM),
                "proj": _linear_init(k[1], EMBED_DIM, EMBED_DIM),
                "norm2": {"g": jnp.ones(EMBED_DIM), "b": jnp.zeros(EMBED_DIM)},
                "fc1": _linear_init(k[2], EMBED_DIM, EMBED_DIM * MLP_RATIO),
                "fc2": _linear_init(k[3], EMBED_DIM * MLP_RATIO, EMBED_DIM),
            }
        )
    return params


def _layer_norm(x, g, b, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * g + b


def _attention(block: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Standard multi-head self-attention over (B, N, D)."""
    b, n, d = x.shape
    head = d // NUM_HEADS
    qkv = x @ block["qkv"]["w"] + block["qkv"]["b"]  # (B, N, 3D)
    qkv = qkv.reshape(b, n, 3, NUM_HEADS, head).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, N, hd)
    attn = jax.nn.softmax(
        (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(head), axis=-1
    )
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, d)
    return out @ block["proj"]["w"] + block["proj"]["b"]


def vit_tokens(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Forward (B, 3, 224, 224) -> per-block token maps (DEPTH, B, N, D).

    Returns all block outputs (pre-final-norm), matching the reference's
    forward hooks over every block (extractor.py:34-60, 92-98).
    """
    # The stride-16 16x16 VALID "conv" over non-overlapping patches is
    # exactly a block reshape + matmul.  Expressed as lax.conv its INPUT
    # gradient lowers to a transposed/dilated conv that costs 40.3ms on v5e
    # (54x the whole rest of the ViT backward, measured) — as a matmul the
    # VJP is just the transposed matmul.
    b, c, hh, ww = x.shape
    gh, gw = hh // PATCH, ww // PATCH
    patches = (
        x.reshape(b, c, gh, PATCH, gw, PATCH)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(b, gh * gw, c * PATCH * PATCH)
    )
    wm = params["patch_embed"]["w"].reshape(EMBED_DIM, -1)  # (D, c*16*16)
    tokens = patches @ wm.T + params["patch_embed"]["b"]  # (B, 196, D)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, EMBED_DIM))
    tokens = jnp.concatenate([cls, tokens], axis=1) + params["pos_embed"]

    outputs = []
    h = tokens
    for block in params["blocks"]:
        h = h + _attention(block, _layer_norm(h, **_gb(block["norm1"])))
        mlp_in = _layer_norm(h, **_gb(block["norm2"]))
        mlp = jax.nn.gelu(mlp_in @ block["fc1"]["w"] + block["fc1"]["b"], approximate=False)
        mlp = mlp @ block["fc2"]["w"] + block["fc2"]["b"]
        h = h + mlp
        outputs.append(h)
    return jnp.stack(outputs)


def _gb(d):
    return {"g": d["g"], "b": d["b"]}


def torch_nearest_resize(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Exact ``F.interpolate(mode='nearest')`` semantics: source index
    ``floor(dst * src/dst)`` (jax.image.resize uses the half-pixel-center
    convention, which picks different pixels).

    Implemented as two one-hot selection matmuls rather than advanced
    indexing: a minor-axis (lane) gather lowers acceptably on TPU but its
    VJP is a lane scatter-add, which is catastrophic — the gather version
    made the ViT backward 54x its forward (40.7ms vs 0.75ms measured on
    v5e, i.e. the entire +82ms/step cost of the Step-2 losses).  One-hot
    matmuls are exact (each output row sums exactly one input element) and
    differentiate into transposed matmuls on the MXU."""
    b, c, h, w = x.shape
    rows = jnp.floor(jnp.arange(size) * (h / size)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(size) * (w / size)).astype(jnp.int32)
    sel_r = (rows[:, None] == jnp.arange(h)[None, :]).astype(x.dtype)  # (size, h)
    sel_c = (cols[:, None] == jnp.arange(w)[None, :]).astype(x.dtype)  # (size, w)
    return jnp.einsum(
        "ph,bchw,qw->bcpq", sel_r, x, sel_c, precision=jax.lax.Precision.HIGHEST
    )


def vit_preprocess(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-resize (B, 3, H, W) to 224 and ImageNet-normalize, matching
    ``F.interpolate(x, size=(224, 224))`` (nearest by default) + mean/std at
    ``sinnerf.py:162-167``."""
    x = torch_nearest_resize(x, IMG_SIZE)
    mean = IMAGENET_MEAN.reshape(1, 3, 1, 1)
    std = IMAGENET_STD.reshape(1, 3, 1, 1)
    return (x - mean) / std


def vit_cls_feature(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """The training-loss feature: final-block CLS token of batch element 0
    (sinnerf.py:169: ``get_feature_from_input(img)[-1][0, 0, :]``).
    x: raw (B, 3, H, W) in [0, 1]; preprocessing applied internally."""
    tokens = vit_tokens(params, vit_preprocess(x))
    return tokens[-1][0, 0, :]


# --------------------------------------------------------------------------
# torch checkpoint interop
# --------------------------------------------------------------------------

def import_torch_vit_state(state_dict: Dict[str, Any]) -> Params:
    """Convert a DINO/timm ViT-S/16 ``state_dict`` to our param pytree.
    Accepts tensors or ndarrays; linear weights transpose to (in, out)."""

    def a(key):
        v = state_dict[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, dtype=np.float32))

    params: Params = {
        "patch_embed": {
            "w": a("patch_embed.proj.weight"),
            "b": a("patch_embed.proj.bias"),
        },
        "cls_token": a("cls_token"),
        "pos_embed": a("pos_embed"),
        "blocks": [],
    }
    for i in range(DEPTH):
        p = f"blocks.{i}."
        params["blocks"].append(
            {
                "norm1": {"g": a(p + "norm1.weight"), "b": a(p + "norm1.bias")},
                "qkv": {
                    "w": a(p + "attn.qkv.weight").T,
                    "b": a(p + "attn.qkv.bias"),
                },
                "proj": {
                    "w": a(p + "attn.proj.weight").T,
                    "b": a(p + "attn.proj.bias"),
                },
                "norm2": {"g": a(p + "norm2.weight"), "b": a(p + "norm2.bias")},
                "fc1": {
                    "w": a(p + "mlp.fc1.weight").T,
                    "b": a(p + "mlp.fc1.bias"),
                },
                "fc2": {
                    "w": a(p + "mlp.fc2.weight").T,
                    "b": a(p + "mlp.fc2.bias"),
                },
            }
        )
    return params


def load_vit_params(path: Optional[str], key: Optional[jax.Array] = None) -> Params:
    """Load converted DINO weights from ``path`` (a torch .pth checkpoint),
    or random-init when path is None (tests / smoke runs)."""
    if path is None:
        return init_vit_params(key if key is not None else jax.random.key(0))
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return import_torch_vit_state(state)
