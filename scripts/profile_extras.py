"""Decompose the Step-2 extras: ViT CLS loss path and discriminator path.

Step-2 measured +82ms/step over the Step-1 losses (211.4 vs 129.5 ms) while
the extra FLOPs are ~30 GFLOP (~1ms at peak) — find where the time goes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sinnerf_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax

import jax.numpy as jnp
import numpy as np

from sinnerf_tpu.models.discriminator import discriminator_apply, init_discriminator
from sinnerf_tpu.models.vit import load_vit_params, vit_preprocess, vit_tokens
from sinnerf_tpu.utils.profiling import time_fn

PS = 64


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(1, 3, PS, PS)).astype(np.float32))
    vit_params = load_vit_params(None)
    d_params, sn_state = init_discriminator(jax.random.key(2), imsize=PS)
    key = jax.random.key(7)

    report = {}

    report["vit_preprocess"] = time_fn(vit_preprocess, img, iters=50)

    def vit_cls(x):
        return vit_tokens(vit_params, vit_preprocess(x))[-1][:, 0, :]

    report["vit_cls_fwd"] = time_fn(vit_cls, img, iters=50)

    gfn = jax.grad(lambda x: jnp.sum(vit_cls(x) ** 2))
    report["vit_cls_fwdbwd"] = time_fn(lambda x: gfn(x), img, iters=50)

    # --- bisect the ViT backward -----------------------------------------
    import jax.numpy as jnp2
    from jax import lax

    from sinnerf_tpu.models import vit as V

    big = jnp.asarray(rng.uniform(size=(1, 3, 224, 224)).astype(np.float32))

    g_pre = jax.grad(lambda x: jnp.sum(vit_preprocess(x) ** 2))
    report["resize_fwdbwd"] = time_fn(lambda x: g_pre(x), img, iters=50)

    def patch_conv(x):
        return lax.conv_general_dilated(
            x, vit_params["patch_embed"]["w"], window_strides=(16, 16),
            padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    g_conv = jax.grad(lambda x: jnp.sum(patch_conv(x) ** 2))
    report["patchconv_fwdbwd"] = time_fn(lambda x: g_conv(x), big, iters=50)

    tokens0 = jnp.asarray(rng.normal(size=(1, 197, 384)).astype(np.float32))

    def blocks_only(t):
        h = t
        for blk in vit_params["blocks"]:
            h = h + V._attention(blk, V._layer_norm(h, **V._gb(blk["norm1"])))
            mlp_in = V._layer_norm(h, **V._gb(blk["norm2"]))
            mlp = jax.nn.gelu(
                mlp_in @ blk["fc1"]["w"] + blk["fc1"]["b"], approximate=False
            )
            h = h + (mlp @ blk["fc2"]["w"] + blk["fc2"]["b"])
        return h[:, 0, :]

    report["blocks_fwd"] = time_fn(blocks_only, tokens0, iters=50)
    g_blocks = jax.grad(lambda t: jnp.sum(blocks_only(t) ** 2))
    report["blocks_fwdbwd"] = time_fn(lambda t: g_blocks(t), tokens0, iters=50)

    def d_fwd(x):
        out, _ = discriminator_apply(
            d_params, sn_state, x, key=key, policy="color,cutout", imsize=PS
        )
        return out

    report["disc_fwd"] = time_fn(d_fwd, img, iters=50)

    dg = jax.grad(lambda x: jnp.sum(d_fwd(x) ** 2))
    report["disc_fwdbwd"] = time_fn(lambda x: dg(x), img, iters=50)

    # --- the other photometric/regularizer loss backends ------------------
    from sinnerf_tpu.losses.depth import inverse_depth_smoothness_loss
    from sinnerf_tpu.models.vgg import load_vgg_params, make_vgg_features, vgg_preprocess
    from sinnerf_tpu.utils.metrics import dssim_loss

    tgt = jnp.asarray(rng.uniform(size=(1, 3, PS, PS)).astype(np.float32))

    g_ssim = jax.grad(lambda x: dssim_loss(x, tgt, window_size=11))
    report["ssim_fwdbwd"] = time_fn(lambda x: jnp.sum(g_ssim(x)), img, iters=50)

    vgg_params = load_vgg_params(None)
    vgg_feats = make_vgg_features(vgg_params)

    g_vgg = jax.grad(
        lambda x: jnp.mean(jnp.abs(vgg_feats(vgg_preprocess(x)) - 0.5))
    )
    report["vgg_fwdbwd"] = time_fn(lambda x: jnp.sum(g_vgg(x)), img, iters=50)

    depth_img = jnp.asarray(rng.uniform(1, 5, size=(1, 1, PS, PS)).astype(np.float32))
    g_sm = jax.grad(lambda d: inverse_depth_smoothness_loss(d, img))
    report["smooth_fwdbwd"] = time_fn(lambda d: jnp.sum(g_sm(d)), depth_img, iters=50)

    for k, v in report.items():
        print(f"{k:20s} {v * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
