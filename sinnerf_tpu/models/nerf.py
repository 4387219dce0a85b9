"""The NeRF MLP as pure functions over a parameter pytree.

Architecture parity with ``models/nerf.py:46-148`` of the reference:
8x256 xyz trunk with a skip concat at layer index 4, a sigma head off the
trunk, a 256-width bottleneck (``xyz_encoding_final``) feeding a
direction-conditioned 128-wide branch, and a 3-channel RGB head.  With
``use_new_activation=True`` (what every training recipe uses,
``models/sinnerf.py:137-141``) the direction branch uses shifted-softplus and
the RGB head a widened sigmoid.

TPU-first notes:
* Parameters are a flat dict of ``{'w': (in, out), 'b': (out,)}`` — weights are
  stored transposed relative to torch so applies are plain ``x @ w + b``
  row-major matmuls on the MXU.
* ``compute_dtype='bfloat16'`` casts activations+weights for the matmuls while
  accumulating in float32 (``preferred_element_type``), roughly doubling MXU
  throughput; params stay float32.
* The skip concat is implemented as a real concat — XLA lays it out once in
  VMEM-resident tiles; the Pallas kernel in ``sinnerf_tpu/ops/fused_mlp.py``
  instead splits the matmul to avoid materializing it.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from sinnerf_tpu.core.activations import shifted_softplus, widened_sigmoid

Params = Dict[str, Dict[str, jnp.ndarray]]

# Layer dimensions for the default config (D=8, W=256, skips=(4,)).
DEFAULT_D = 8
DEFAULT_W = 256
IN_XYZ = 63
IN_DIR = 27


def _linear_init(key: jax.Array, fan_in: int, fan_out: int) -> Dict[str, jnp.ndarray]:
    """torch ``nn.Linear`` default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    for both weight and bias (kaiming_uniform with a=sqrt(5))."""
    bound = 1.0 / math.sqrt(fan_in)
    wk, bk = jax.random.split(key)
    return {
        "w": jax.random.uniform(wk, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(bk, (fan_out,), jnp.float32, -bound, bound),
    }


def init_nerf_params(
    key: jax.Array,
    depth: int = DEFAULT_D,
    width: int = DEFAULT_W,
    in_channels_xyz: int = IN_XYZ,
    in_channels_dir: int = IN_DIR,
    skips: Tuple[int, ...] = (4,),
) -> Params:
    """Build the parameter pytree.  Key names mirror the reference module names
    so torch checkpoints map 1:1 (see ``import_torch_state``)."""
    keys = jax.random.split(key, depth + 4)
    params: Params = {}
    for i in range(depth):
        fan_in = in_channels_xyz if i == 0 else width
        if i in skips:
            fan_in = width + in_channels_xyz
        params[f"xyz_encoding_{i + 1}"] = _linear_init(keys[i], fan_in, width)
    params["xyz_encoding_final"] = _linear_init(keys[depth], width, width)
    params["sigma"] = _linear_init(keys[depth + 1], width, 1)
    params["dir_encoding"] = _linear_init(
        keys[depth + 2], width + in_channels_dir, width // 2
    )
    params["rgb"] = _linear_init(keys[depth + 3], width // 2, 3)
    return params


def _dense(
    x: jnp.ndarray, layer: Dict[str, jnp.ndarray], compute_dtype: Optional[Any]
) -> jnp.ndarray:
    w, b = layer["w"], layer["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + b


def permute_params_for_blocked_pe(
    params: Params,
    in_channels_xyz: int = IN_XYZ,
    in_channels_dir: int = IN_DIR,
    skips: Tuple[int, ...] = (4,),
) -> Params:
    """Return a params view whose PE-consuming weight rows are permuted for
    the lane-friendly blocked PE layout (see
    ``core.encoding.positional_encoding_blocked``).  Three small gathers; the
    rest of the pytree is shared."""
    from sinnerf_tpu.core.encoding import blocked_perm

    px = blocked_perm(3, (in_channels_xyz // 3 - 1) // 2)
    pd = blocked_perm(3, (in_channels_dir // 3 - 1) // 2)
    out = dict(params)
    out["xyz_encoding_1"] = {
        "w": params["xyz_encoding_1"]["w"][px],
        "b": params["xyz_encoding_1"]["b"],
    }
    for i in skips:
        key = f"xyz_encoding_{i + 1}"
        w = params[key]["w"]
        out[key] = {
            "w": jnp.concatenate([w[:in_channels_xyz][px], w[in_channels_xyz:]]),
            "b": params[key]["b"],
        }
    wd = params["dir_encoding"]["w"]
    width = wd.shape[0] - in_channels_dir
    out["dir_encoding"] = {
        "w": jnp.concatenate([wd[:width], wd[width:][pd]]),
        "b": params["dir_encoding"]["b"],
    }
    return out


def nerf_apply(
    params: Params,
    xyz_embedded: jnp.ndarray,
    dir_embedded: Optional[jnp.ndarray] = None,
    sigma_only: bool = False,
    use_new_activation: bool = True,
    skips: Tuple[int, ...] = (4,),
    compute_dtype: Optional[Any] = None,
    pe_layout: str = "reference",
) -> jnp.ndarray:
    """Forward pass.  Matches ``models/nerf.py:105-148``.

    xyz_embedded: (..., 63); dir_embedded: (..., 27) unless ``sigma_only``.
    Returns (..., 1) sigma if ``sigma_only`` else (..., 4) ``[rgb, sigma]``.
    ``pe_layout='blocked'`` expects inputs from
    ``positional_encoding_blocked`` (weight rows are permuted to match).
    """
    if pe_layout == "blocked":
        params = permute_params_for_blocked_pe(params, skips=skips)
    depth = sum(1 for k in params if k.startswith("xyz_encoding_") and k[13:].isdigit())
    x = xyz_embedded
    for i in range(depth):
        if i in skips:
            x = jnp.concatenate([xyz_embedded, x], axis=-1)
        x = _dense(x, params[f"xyz_encoding_{i + 1}"], compute_dtype)
        x = jax.nn.relu(x)

    sigma = _dense(x, params["sigma"], compute_dtype)
    if sigma_only:
        return sigma

    feat = _dense(x, params["xyz_encoding_final"], compute_dtype)
    d = jnp.concatenate([feat, dir_embedded.astype(feat.dtype)], axis=-1)
    d = _dense(d, params["dir_encoding"], compute_dtype)
    d = shifted_softplus(d) if use_new_activation else jax.nn.relu(d)
    rgb = _dense(d, params["rgb"], compute_dtype)
    rgb = widened_sigmoid(rgb) if use_new_activation else jax.nn.sigmoid(rgb)
    return jnp.concatenate([rgb, sigma], axis=-1)


def _dense_t(
    x_t: jnp.ndarray, layer: Dict[str, jnp.ndarray], compute_dtype: Optional[Any]
) -> jnp.ndarray:
    """Channel-major dense: x_t (in, N) -> (out, N) via W^T x + b."""
    w, b = layer["w"], layer["b"]
    if compute_dtype is not None:
        x_t = x_t.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jax.lax.dot_general(
        w, x_t, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return y + b[:, None]


def nerf_apply_t(
    params: Params,
    xyz_pe_t: jnp.ndarray,
    dir_pe_t: Optional[jnp.ndarray] = None,
    sigma_only: bool = False,
    use_new_activation: bool = True,
    skips: Tuple[int, ...] = (4,),
    compute_dtype: Optional[Any] = None,
) -> jnp.ndarray:
    """Channel-major forward: xyz_pe_t (63, N), dir_pe_t (27, N) in the
    *blocked* PE layout -> (4, N) [rgb, sigma] (or (1, N) sigma).

    Numerically identical to ``nerf_apply(..., pe_layout='blocked')``; the
    transposed data layout keeps N on the TPU lane axis so no point-level
    tensor pays the 128-lane padding of a minor dim (see
    ``core.encoding.positional_encoding_blocked_t``).
    """
    params = permute_params_for_blocked_pe(params, skips=skips)
    depth = sum(1 for k in params if k.startswith("xyz_encoding_") and k[13:].isdigit())
    in_xyz = xyz_pe_t.shape[0]
    x = xyz_pe_t
    for i in range(depth):
        if i in skips:
            # algebraic split of the skip concat: cat([pe, h]) @ W ==
            # pe @ W[:in_xyz] + h @ W[in_xyz:] — avoids materializing a
            # (319, N) tensor (multi-GB at training point counts)
            w = params[f"xyz_encoding_{i + 1}"]
            x = (
                _dense_t(xyz_pe_t, {"w": w["w"][:in_xyz], "b": w["b"]}, compute_dtype)
                + _dense_t(x, {"w": w["w"][in_xyz:], "b": jnp.zeros_like(w["b"])}, compute_dtype)
            )
        else:
            x = _dense_t(x, params[f"xyz_encoding_{i + 1}"], compute_dtype)
        x = jax.nn.relu(x)

    sigma = _dense_t(x, params["sigma"], compute_dtype)
    if sigma_only:
        return sigma

    feat = _dense_t(x, params["xyz_encoding_final"], compute_dtype)
    wd = params["dir_encoding"]
    width = wd["w"].shape[0] - dir_pe_t.shape[0]
    d = (
        _dense_t(feat, {"w": wd["w"][:width], "b": wd["b"]}, compute_dtype)
        + _dense_t(dir_pe_t, {"w": wd["w"][width:], "b": jnp.zeros_like(wd["b"])}, compute_dtype)
    )
    d = shifted_softplus(d) if use_new_activation else jax.nn.relu(d)
    rgb = _dense_t(d, params["rgb"], compute_dtype)
    rgb = widened_sigmoid(rgb) if use_new_activation else jax.nn.sigmoid(rgb)
    return jnp.concatenate([rgb, sigma], axis=0)


# --------------------------------------------------------------------------
# PyTorch checkpoint interop (utils/__init__.py:60-83 semantics)
# --------------------------------------------------------------------------

_TORCH_KEY_MAP = {
    # our param key -> torch submodule prefix (inside e.g. "nerf_coarse.")
    **{f"xyz_encoding_{i}": f"xyz_encoding_{i}.0" for i in range(1, 16)},
    "xyz_encoding_final": "xyz_encoding_final",
    "sigma": "sigma",
    "dir_encoding": "dir_encoding.0",
    "rgb": "rgb.0",
}


def import_torch_state(
    state_dict: Dict[str, Any], model_prefix: str = ""
) -> Params:
    """Convert a torch ``state_dict`` (tensor or ndarray values) into our param
    pytree.  ``model_prefix`` strips e.g. ``"nerf_coarse."`` the way the
    reference's ``extract_model_state_dict`` does (``utils/__init__.py:60-75``).
    Weights transpose from torch's (out, in) to our (in, out).
    """
    import numpy as np

    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    params: Params = {}
    for our_key, torch_prefix in _TORCH_KEY_MAP.items():
        wk = f"{model_prefix}{torch_prefix}.weight"
        bk = f"{model_prefix}{torch_prefix}.bias"
        if wk not in state_dict:
            continue
        params[our_key] = {
            "w": jnp.asarray(to_np(state_dict[wk]).T),
            "b": jnp.asarray(to_np(state_dict[bk])),
        }
    if not params:
        raise KeyError(
            f"no NeRF weights found under prefix {model_prefix!r}; "
            f"available keys: {list(state_dict)[:5]}..."
        )
    return params


def export_torch_state(params: Params, model_prefix: str = "") -> Dict[str, Any]:
    """Inverse of ``import_torch_state`` (numpy values, torch layout)."""
    import numpy as np

    out = {}
    for our_key, torch_prefix in _TORCH_KEY_MAP.items():
        if our_key not in params:
            continue
        out[f"{model_prefix}{torch_prefix}.weight"] = np.asarray(
            params[our_key]["w"]
        ).T
        out[f"{model_prefix}{torch_prefix}.bias"] = np.asarray(params[our_key]["b"])
    return out
