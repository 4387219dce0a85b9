"""The volume-rendering hot path as a single fused XLA program.

Parity target: ``models/rendering.py:126-335`` (``render_rays``).  The
reference chunks rays through Python loops at three levels
(``sinnerf.py:171-193``, ``rendering.py:196``, ``eval.py:92``); here one jitted
call renders the entire ray batch — stratified sampling -> positional encoding
-> coarse MLP -> compositing -> inverse-CDF importance resampling -> fine MLP
-> compositing — with no host round-trips.  Validation-size batches are tiled
with ``lax.map`` (``render_chunked``) purely for memory control.

Outputs use the reference's result-dict schema: ``rgb_coarse, depth_coarse,
opacity_coarse, rgb_fine, depth_fine, opacity_fine`` where ``opacity_*`` holds
the per-sample weights (N_rays, S) exactly as the reference returns them.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from sinnerf_tpu.core.composite import composite_t, compute_weights
from sinnerf_tpu.core.encoding import (
    positional_encoding,
    positional_encoding_blocked_t,
)
from sinnerf_tpu.core.sampling import sample_pdf, stratified_z_vals
from sinnerf_tpu.models.nerf import Params, nerf_apply, nerf_apply_t

N_FREQS_XYZ = 10  # models/sinnerf.py:133
N_FREQS_DIR = 4   # models/sinnerf.py:134


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static render configuration (hashable -> usable as a jit static arg).

    Field names/defaults mirror ``opt.py:19-28`` and the ``render_rays``
    signature at ``models/rendering.py:126-139``.
    """

    n_samples: int = 64
    n_importance: int = 128
    use_disp: bool = False
    perturb: float = 1.0
    noise_std: float = 1.0
    white_back: bool = False
    test_time: bool = False
    detach_coarse: bool = False
    use_new_activation: bool = True
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    mlp_impl: str = "pallas"  # 'pallas' (fused kernels, default) | 'xla'
    # Stratified (sorted) importance samples in the stochastic case — lower
    # variance than the reference's iid uniforms, same marginal coverage.
    # Exact reference semantics with fast_merge=False.
    fast_merge: bool = True
    # Deterministic renders (perturb=0, noise=0) on the pallas path use the
    # fused per-ray kernel (ops/fused_render_t.py): PE + MLP + online
    # compositing in one kernel, nothing per-point touches HBM.  Fully
    # differentiable: its custom VJP recomputes through the per-point
    # composition, giving correct gradients for params AND rays/depths.
    fast_eval: bool = True
    # Stochastic (training) renders on the pallas path use the per-ray
    # TRAIN kernels (ops/fused_render_train_t.py): dir-PE once per ray in
    # both directions, compositing fused, parameter-grads-only VJP (rays,
    # depths, and sigma noise are stop_gradient'ed — exactly the training
    # data flow).  To differentiate a stochastic render w.r.t. RAYS or
    # DEPTHS, set fast_train=False (the XLA path has full gradients).
    fast_train: bool = True
    # Points per MLP chunk: bounds peak HBM (activations are (256, chunk));
    # chunks stream through lax.map with rematerialized backward.
    points_chunk: int = 2 * 1024 * 1024

    def eval_mode(self) -> "RenderSettings":
        """Deterministic settings for validation/eval (eval.py:95-107)."""
        return dataclasses.replace(self, perturb=0.0, noise_std=0.0)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None


def _query_t(
    model_params: Params,
    rays_o_t: jnp.ndarray,
    rays_d_t: jnp.ndarray,
    z_vals: jnp.ndarray,
    settings: RenderSettings,
    sigma_only: bool,
) -> jnp.ndarray:
    """Evaluate one NeRF on the sampled points of every ray, channel-major.

    rays_o_t/rays_d_t: (3, N_rays); z_vals: (N_rays, S).
    Returns (4, N_rays, S) rgb+sigma (or (N_rays, S) sigma when sigma_only).

    The whole pipeline keeps the point axis on TPU lanes: the world positions
    are (3, N*S), the PE (63, N*S), activations (256, N*S) — no minor-dim-3
    tensors, which HBM would pad 128/3x (measured: the row-major layout spent
    more time on PE + layout than on the MLP itself).
    """
    n_rays, s = z_vals.shape
    n_pts = n_rays * s
    cd = settings.dtype  # bf16 storage for the big point-level tensors
    xyz_t = (
        rays_o_t[:, :, None] + rays_d_t[:, :, None] * z_vals[None]
    ).reshape(3, n_pts)
    if sigma_only:
        dir_t = jnp.zeros_like(xyz_t)
    else:
        dir_t = jnp.broadcast_to(
            rays_d_t[:, :, None], (3, n_rays, s)
        ).reshape(3, n_pts)

    def apply_chunk(args):
        """PE + MLP for one point chunk; PE phases evaluate in f32 and only
        the bounded sin/cos outputs store in bf16."""
        xc, dc = args
        if settings.mlp_impl == "pallas":
            from sinnerf_tpu.ops.fused_mlp_t import fused_nerf_mlp_t

            # PE runs inside the kernel (takes raw (3, chunk) xyz/dir) and
            # the custom VJP recomputes in-kernel; no extra remat needed
            return fused_nerf_mlp_t(
                model_params,
                xc,
                None if sigma_only else dc,
                sigma_only,
                settings.use_new_activation,
                settings.compute_dtype,
            )
        xyz_pe_t = positional_encoding_blocked_t(xc, N_FREQS_XYZ, out_dtype=cd)
        d_pe_t = (
            None
            if sigma_only
            else positional_encoding_blocked_t(dc, N_FREQS_DIR, out_dtype=cd)
        )
        # remat: recompute this chunk's activations in backward instead of
        # storing 13x (256, chunk) residuals (tens of GB at training sizes)
        fn = jax.checkpoint(
            lambda p, x, d: nerf_apply_t(
                p,
                x,
                d,
                sigma_only=sigma_only,
                use_new_activation=settings.use_new_activation,
                compute_dtype=settings.dtype,
            )
        )
        return fn(model_params, xyz_pe_t, d_pe_t)

    chunk = settings.points_chunk
    if settings.mlp_impl == "pallas" or n_pts <= chunk:
        # The Pallas path never chunks: its VMEM footprint is fixed by the
        # kernel tile regardless of N (activations live in-kernel, the VJP
        # recomputes in-kernel), and point counts that aren't a chunk
        # multiple would pad to one — at the train shape (3.1M fine points
        # vs the 2M chunk) that wasted 33% of the fine pass and 100% of the
        # coarse pass.  Chunking exists solely for the XLA fallback's remat.
        out = apply_chunk((xyz_t, dir_t))
    else:
        pad = (-n_pts) % chunk
        xyz_p = jnp.pad(xyz_t, ((0, 0), (0, pad))).reshape(3, -1, chunk)
        dir_p = jnp.pad(dir_t, ((0, 0), (0, pad))).reshape(3, -1, chunk)
        out = jax.lax.map(
            apply_chunk,
            (xyz_p.transpose(1, 0, 2), dir_p.transpose(1, 0, 2)),
        )  # (K, C_out, chunk)
        out = out.transpose(1, 0, 2).reshape(out.shape[1], -1)[:, :n_pts]

    if sigma_only:
        return out.reshape(n_rays, s)
    return out.reshape(4, n_rays, s)


def _fused_train_level(
    level_params: Params,
    rays_o_t: jnp.ndarray,
    rays_d_t: jnp.ndarray,
    z_vals: jnp.ndarray,
    settings: RenderSettings,
    noise_key: jax.Array,
):
    """One render level through the per-ray TRAIN kernels
    (``ops/fused_render_train_t.py``).  The sigma noise is drawn here with
    the same key/shape as ``core.composite.compute_weights`` (bit-identical
    stream), and rays/depths/noise are stop_gradient'ed because the fused
    VJP produces parameter grads only (the reference detaches the same
    quantities: rays are data, fine depths at ``rendering.py:311-313``)."""
    from sinnerf_tpu.ops.fused_render_train_t import fused_render_level_train

    noise = None
    if settings.noise_std > 0 and not settings.test_time:
        noise = settings.noise_std * jax.random.normal(
            noise_key, z_vals.shape, dtype=jnp.float32
        )
        noise = jax.lax.stop_gradient(noise)
    rays_od_t = jax.lax.stop_gradient(
        jnp.concatenate([rays_o_t, rays_d_t], axis=0)
    )
    return fused_render_level_train(
        level_params,
        rays_od_t,
        jax.lax.stop_gradient(z_vals),
        noise,
        settings.use_new_activation,
        settings.white_back,
        settings.compute_dtype,
    )


def render_rays(
    params: Dict[str, Params],
    rays: jnp.ndarray,
    key: Optional[jax.Array] = None,
    settings: RenderSettings = RenderSettings(),
) -> Dict[str, jnp.ndarray]:
    """Render a batch of rays.

    params: ``{'coarse': nerf_params, 'fine': nerf_params}`` (fine optional
    when ``n_importance == 0``).
    rays: (N_rays, 8) ``[o, d, near, far]``; directions unnormalized.
    key: PRNG key; required when perturb/noise/stochastic-pdf are active.
    """
    stochastic = (
        settings.perturb > 0 or settings.noise_std > 0
    ) and not settings.test_time
    if key is None:
        if stochastic:
            raise ValueError("stochastic rendering requires a PRNG key")
        key = jax.random.key(0)
    k_perturb, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)

    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]

    # channel-major views for the hot path (the (N, 8) ray bundle itself is
    # small; the transposes here are negligible); direction PE is computed
    # per-point inside the chunked query
    rays_o_t = rays_o.T  # (3, N)
    rays_d_t = rays_d.T

    z_vals = stratified_z_vals(
        near,
        far,
        settings.n_samples,
        use_disp=settings.use_disp,
        perturb=settings.perturb,
        key=k_perturb,
    )

    # Deterministic pallas renders go through the fused per-ray kernel
    # (PE + MLP + online compositing in VMEM, forward-only).
    fused_eval = (
        settings.mlp_impl == "pallas"
        and settings.fast_eval
        and not settings.test_time
        and not stochastic
    )
    if fused_eval:
        from sinnerf_tpu.ops.fused_render_t import fused_render_level

        rays_od_t = jnp.concatenate([rays_o_t, rays_d_t], axis=0)  # (6, N)

    result: Dict[str, jnp.ndarray] = {}
    if settings.test_time:
        # Deviation: no sigma noise here (the reference's inference() adds
        # randn*noise_std even in this weights_only branch, rendering.py:224
        # — but test_time=True has no caller anywhere in the reference tree,
        # and every real eval config passes noise_std=0)
        sigmas = _query_t(
            params["coarse"], rays_o_t, rays_d_t, z_vals, settings, True
        )
        weights_coarse = compute_weights(sigmas, z_vals, rays_d)
        result["opacity_coarse"] = weights_coarse
    elif fused_eval:
        coarse_params = params["coarse"]
        if settings.detach_coarse:
            coarse_params = jax.lax.stop_gradient(coarse_params)
        rgb_c, depth_c, weights_coarse = fused_render_level(
            coarse_params, rays_od_t, z_vals,
            settings.use_new_activation, settings.white_back,
            settings.compute_dtype,
        )
        result["rgb_coarse"] = rgb_c
        result["depth_coarse"] = depth_c
        result["opacity_coarse"] = weights_coarse
    else:
        coarse_params = params["coarse"]
        if settings.detach_coarse:
            coarse_params = jax.lax.stop_gradient(coarse_params)
        if settings.mlp_impl == "pallas" and settings.fast_train:
            rgb_c, depth_c, weights_coarse = _fused_train_level(
                coarse_params, rays_o_t, rays_d_t, z_vals, settings, k_noise_c
            )
            result["rgb_coarse"] = rgb_c
            result["depth_coarse"] = depth_c
            result["opacity_coarse"] = weights_coarse
        else:
            out = _query_t(
                coarse_params, rays_o_t, rays_d_t, z_vals, settings, False
            )
            comp = composite_t(
                out[0:3],
                out[3],
                z_vals,
                rays_d,
                noise_std=settings.noise_std,
                key=k_noise_c,
                white_back=settings.white_back,
            )
            weights_coarse = comp.weights
            result["rgb_coarse"] = comp.rgb
            result["depth_coarse"] = comp.depth
            result["opacity_coarse"] = comp.weights

    if settings.n_importance > 0:
        det = settings.perturb == 0
        if settings.mlp_impl == "pallas" and settings.fast_merge:
            # Fused Pallas resample+merge (ops/fused_sample_pdf_t.py): CDF on
            # the MXU, inverse CDF and the bitonic z-merge in VMEM.  Output is
            # gradient-dead (reference detaches the resampled depths at
            # rendering.py:311-313 and no parameter reaches z otherwise), so
            # the forward-only kernel under stop_gradient is exact.
            from sinnerf_tpu.ops.fused_sample_pdf_t import fused_sample_pdf_merge

            u = None
            if not det:
                # identical draw to sample_pdf(sorted_u=True): same key/shape
                u = jax.random.uniform(
                    k_pdf,
                    (z_vals.shape[0], settings.n_importance),
                    dtype=z_vals.dtype,
                )
            # detach the INPUTS (not just the output) so autodiff never
            # linearizes into the forward-only kernel
            z_all = fused_sample_pdf_merge(
                jax.lax.stop_gradient(z_vals),
                jax.lax.stop_gradient(weights_coarse),
                settings.n_importance,
                u,
                det,
            )
        else:
            z_mid = 0.5 * (z_vals[..., :-1] + z_vals[..., 1:])
            z_fine = sample_pdf(
                z_mid,
                weights_coarse[:, 1:-1],
                settings.n_importance,
                det=det,
                key=k_pdf,
                sorted_u=settings.fast_merge,
            )
            # Grad must not flow into coarse weights through the resampling
            # (rendering.py:311-313).
            z_fine = jax.lax.stop_gradient(z_fine)
            # NOTE: an O(n) comparison-rank two-way merge is algorithmically
            # cheaper but its row scatter lowers catastrophically on TPU
            # (57ms vs 2.6ms for XLA's sort at 65k rays) — sort wins.
            z_all = jnp.sort(jnp.concatenate([z_vals, z_fine], axis=-1), axis=-1)

        if fused_eval:
            rgb_f, depth_f, weights_fine = fused_render_level(
                params["fine"], rays_od_t, z_all,
                settings.use_new_activation, settings.white_back,
                settings.compute_dtype,
            )
            result["rgb_fine"] = rgb_f
            result["depth_fine"] = depth_f
            result["opacity_fine"] = weights_fine
        elif settings.mlp_impl == "pallas" and settings.fast_train:
            rgb_f, depth_f, weights_fine = _fused_train_level(
                params["fine"], rays_o_t, rays_d_t, z_all, settings, k_noise_f
            )
            result["rgb_fine"] = rgb_f
            result["depth_fine"] = depth_f
            result["opacity_fine"] = weights_fine
        else:
            out = _query_t(
                params["fine"], rays_o_t, rays_d_t, z_all, settings, False
            )
            comp = composite_t(
                out[0:3],
                out[3],
                z_all,
                rays_d,
                noise_std=settings.noise_std if not settings.test_time else 0.0,
                key=k_noise_f,
                white_back=settings.white_back,
            )
            result["rgb_fine"] = comp.rgb
            result["depth_fine"] = comp.depth
            result["opacity_fine"] = comp.weights
    elif not settings.test_time:
        # Mirror rendering.py:330-333: fine aliases coarse when N_importance=0.
        result["rgb_fine"] = result["rgb_coarse"]
        result["depth_fine"] = result["depth_coarse"]
        result["opacity_fine"] = result["opacity_coarse"]

    return result


def _render_tiles(
    params: Dict[str, Params],
    rays_padded: jnp.ndarray,
    settings: RenderSettings,
    tile: int,
) -> Dict[str, jnp.ndarray]:
    """lax.map over fixed-size ray tiles; rays_padded must be a tile multiple."""
    tiles = rays_padded.reshape(-1, tile, 8)
    out_tiles = jax.lax.map(
        lambda r: render_rays(params, r, None, settings), tiles
    )
    return {k: v.reshape(-1, *v.shape[2:]) for k, v in out_tiles.items()}


@partial(jax.jit, static_argnames=("settings", "tile"))
def render_chunked(
    params: Dict[str, Params],
    rays: jnp.ndarray,
    settings: RenderSettings,
    tile: int = 32768,
) -> Dict[str, jnp.ndarray]:
    """Deterministic whole-image rendering, tiled with ``lax.map`` for memory.

    Replaces the reference's host chunk loops (``sinnerf.py:175``,
    ``eval.py:92``): one compile, serial on-device tiles, no host syncs.
    Rays are padded to a tile multiple; padding is sliced off afterwards.
    """
    eval_settings = settings.eval_mode()
    n = rays.shape[0]
    n_pad = (-n) % tile
    rays_padded = jnp.pad(rays, ((0, n_pad), (0, 0)), constant_values=1.0)
    out = _render_tiles(params, rays_padded, eval_settings, tile)
    return {k: v[:n] for k, v in out.items()}


@partial(jax.jit, static_argnames=("settings", "tile", "mesh", "axis"))
def render_chunked_sharded(
    params: Dict[str, Params],
    rays: jnp.ndarray,
    settings: RenderSettings,
    mesh,
    tile: int = 32768,
    axis: str = "data",
) -> Dict[str, jnp.ndarray]:
    """``render_chunked`` with the ray axis sharded over a device mesh.

    Rays are embarrassingly parallel (SURVEY.md §5): each device renders its
    own contiguous slab of ``tile``-sized tiles under ``shard_map`` with no
    collectives; outputs concatenate along the ray axis.  This is the
    multi-chip equivalent of the reference's per-rank DDP validation
    (``datasets/llff.py:170`` val_num).  Params must be replicated.
    """
    from jax.sharding import PartitionSpec as P

    eval_settings = settings.eval_mode()
    n = rays.shape[0]
    size = mesh.devices.size
    n_pad = (-n) % (tile * size)
    rays_padded = jnp.pad(rays, ((0, n_pad), (0, 0)), constant_values=1.0)
    # check_vma=False: the Pallas MLP kernels carry no varying-mesh-axes
    # annotations; the body is collective-free so the check adds nothing.
    fn = jax.shard_map(
        lambda p, r: _render_tiles(p, r, eval_settings, tile),
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(axis),
        check_vma=False,
    )
    out = fn(params, rays_padded)
    return {k: v[:n] for k, v in out.items()}


def pick_val_tile(n_rays: int, chunk: int, n_devices: int = 1) -> int:
    """A static per-run tile for image-sized renders: one compile across all
    validation images (they share H*W), sized so each device gets whole tiles
    without gross padding."""
    per_device = -(-n_rays // n_devices)
    rounded = -(-per_device // 256) * 256
    return max(256, min(chunk, rounded))


def eval_points(
    params: Dict[str, Params], points: jnp.ndarray, settings: RenderSettings = RenderSettings()
) -> jnp.ndarray:
    """Raw sigma query of the fine model for point-cloud extraction.

    Parity with ``models/rendering.py:64-123`` (``eval_points``).
    points: (N, 3) world positions -> (N, 1) sigma.
    """
    pe = positional_encoding(points, N_FREQS_XYZ)
    model = params.get("fine", params["coarse"])
    return nerf_apply(
        model,
        pe,
        None,
        sigma_only=True,
        use_new_activation=settings.use_new_activation,
        compute_dtype=settings.dtype,
    )
