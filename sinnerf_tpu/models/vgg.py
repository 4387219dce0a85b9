"""VGG16 feature trunk (through relu4_3) for the l2_vgg perceptual loss.

Parity target: ``losses.py:112-132`` (``VGG16LossDirect``) — the first 23
layers of torchvision ``vgg16.features``: conv blocks 64-64 / 128-128 /
256-256-256 / 512-512-512 with maxpools, stopping after relu4_3.

Pretrained weights must be supplied as a local torch checkpoint (the reference
downloads them via torchvision at construction; we make that explicit).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import jax.numpy as jnp

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

# (out_channels per conv, 'M' = maxpool) — vgg16.features[:23]
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512]

Params = List[Dict[str, jnp.ndarray]]


def init_vgg_params(key: jax.Array) -> Params:
    params: Params = []
    cin = 3
    keys = jax.random.split(key, len([c for c in _CFG if c != "M"]))
    i = 0
    for c in _CFG:
        if c == "M":
            continue
        fan_in = cin * 9
        bound = 1.0 / math.sqrt(fan_in)
        wk, bk = jax.random.split(keys[i])
        params.append(
            {
                "w": jax.random.uniform(wk, (c, cin, 3, 3), jnp.float32, -bound, bound),
                "b": jax.random.uniform(bk, (c,), jnp.float32, -bound, bound),
            }
        )
        cin = c
        i += 1
    return params


def vgg_preprocess(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-resize (B, 3, H, W) to 224 + ImageNet normalize
    (losses.py:124-131; torch F.interpolate nearest semantics)."""
    from sinnerf_tpu.models.vit import torch_nearest_resize

    x = torch_nearest_resize(x, 224)
    return (x - IMAGENET_MEAN.reshape(1, 3, 1, 1)) / IMAGENET_STD.reshape(1, 3, 1, 1)


def vgg_features(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, 224, 224) normalized -> relu4_3 feature maps (B, 512, 28, 28)."""
    h = x
    conv_i = 0
    for c in _CFG:
        if c == "M":
            h = jax.lax.reduce_window(
                h,
                -jnp.inf,
                jax.lax.max,
                window_dimensions=(1, 1, 2, 2),
                window_strides=(1, 1, 2, 2),
                padding="VALID",
            )
            continue
        layer = params[conv_i]
        h = jax.lax.conv_general_dilated(
            h,
            layer["w"],
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + layer["b"][None, :, None, None]
        h = jax.nn.relu(h)
        conv_i += 1
    return h


def make_vgg_features(params: Params):
    """Bind params -> the callable expected by ``l2_vgg_loss``."""
    return lambda x: vgg_features(params, x)


def import_torch_vgg_state(state_dict: Dict[str, Any]) -> Params:
    """Convert torchvision ``vgg16().state_dict()`` (or just its ``features``
    sub-dict) into our param list."""

    def a(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, dtype=np.float32))

    # torchvision indices of the 10 convs within features[:23]
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21]
    params: Params = []
    for i in conv_idx:
        for prefix in (f"features.{i}.", f"{i}."):
            if prefix + "weight" in state_dict:
                params.append(
                    {"w": a(state_dict[prefix + "weight"]), "b": a(state_dict[prefix + "bias"])}
                )
                break
        else:
            raise KeyError(f"conv {i} not found in vgg state_dict")
    return params


def load_vgg_params(path: Optional[str], key: Optional[jax.Array] = None) -> Params:
    if path is None:
        return init_vgg_params(key if key is not None else jax.random.key(0))
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return import_torch_vgg_state(state)
