"""Eval CLI — mirrors the reference ``eval.py``: load a coarse+fine NeRF
checkpoint (ours or a PyTorch reference ckpt), render every pose of the chosen
dataset split, write PNGs (+ optional depth as pfm/npy/png) and a GIF, and
print the mean PSNR over poses with ground truth.

The 512k-ray host chunk loop (``eval.py:84-115``) is replaced by a single
jit-compiled ``render_chunked`` program that tiles on device.

Example (reference README.md:92 works unchanged):

    python eval.py --root_dir data/nerf_llff_data/room --dataset_name llff \
        --scene_name llff_room_s4 --img_wh 504 378 --N_importance 64 \
        --split val --ckpt_path ckpts/room.ckpt
"""

import os
from argparse import ArgumentParser
import numpy as np

from sinnerf_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


_EVAL_FLAGS = [
    ("root_dir", dict(type=str, required=True, help="root directory of dataset")),
    ("dataset_name", dict(type=str, default="blender_ray_patch_1image_rot3d",
                          choices=["llff", "blender_ray_patch_1image_rot3d",
                                   "dtu_proj", "llff_ray_patch_1image_proj",
                                   "blender_ray_patch_1image_proj"],
                          help="which dataset to validate")),
    ("scene_name", dict(type=str, default="test", help="output folder name")),
    ("split", dict(type=str, default="test", help="test / test_train / val")),
    ("img_wh", dict(nargs="+", type=int, default=[800, 800])),
    ("spheric_poses", dict(flag=True)),
    ("angle", dict(type=int, default=64)),
    ("N_samples", dict(type=int, default=64)),
    ("N_importance", dict(type=int, default=128)),
    ("use_disp", dict(flag=True)),
    ("chunk", dict(type=int, default=32 * 1024 * 4,
                   help="on-device tile size for image rendering")),
    ("timestamp", dict(type=str, default="")),
    ("ckpt_path", dict(type=str, required=True,
                       help="checkpoint to load (orbax dir or torch .ckpt)")),
    ("depth_type", dict(type=str, default="nerf")),
    ("save_depth", dict(flag=True)),
    ("depth_format", dict(type=str, default="pfm",
                          choices=["pfm", "bytes", "npy", "png"])),
    ("model", dict(type=str, default="nerf", choices=["nerf", "nerf_ft"])),
    ("scan", dict(type=int, default=4)),
    ("compute_dtype", dict(type=str, default="float32",
                           choices=["float32", "bfloat16"])),
    ("mlp_impl", dict(type=str, default="pallas", choices=["xla", "pallas"])),
    ("ref_idx", dict(type=int, default=None,
                     help="override the blender reference-frame index")),
    ("num_gpus", dict(type=int, default=1,
                      help="chips to shard image rendering over")),
]


def get_opts(args=None):
    parser = ArgumentParser()
    for name, spec in _EVAL_FLAGS:
        spec = dict(spec)
        if spec.pop("flag", False):
            parser.add_argument(f"--{name}", default=False, action="store_true")
        else:
            parser.add_argument(f"--{name}", **spec)
    return parser.parse_args(args)


def load_params(ckpt_path: str):
    """Accept an orbax checkpoint dir or a reference torch .ckpt file."""
    import jax.numpy as jnp
    import jax

    from sinnerf_tpu.train.checkpoints import (
        load_checkpoint,
        load_torch_nerf_checkpoint,
    )

    if os.path.isdir(ckpt_path):
        tree = load_checkpoint(ckpt_path)
        params = tree.get("state", tree).get("params", tree.get("params", tree))
        params = {k: params[k] for k in ("coarse", "fine") if k in params}
        if not params:
            # fail fast: without this, the fallback-to-whole-tree chain above
            # surfaces as a cryptic KeyError deep inside jit tracing
            raise ValueError(
                f"{ckpt_path} holds no 'coarse'/'fine' NeRF params "
                f"(top-level keys: {sorted(tree)}) — is it a checkpoint "
                f"written by this trainer?"
            )
    else:
        params = load_torch_nerf_checkpoint(ckpt_path)
    return jax.tree_util.tree_map(jnp.asarray, params)


def main(args):
    import imageio
    import jax.numpy as jnp

    from sinnerf_tpu.data import dataset_dict
    from sinnerf_tpu.data.depth_io import save_pfm
    from sinnerf_tpu.render.renderer import (
        RenderSettings,
        pick_val_tile,
        render_chunked,
        render_chunked_sharded,
    )
    from sinnerf_tpu.utils.visualization import visualize_depth

    if args.timestamp == "":
        parts = args.ckpt_path.split('/')
        args.timestamp = parts[1] if len(parts) > 1 else 'ckpt'

    w, h = args.img_wh
    kwargs = dict(vars(args))
    kwargs["img_wh"] = tuple(args.img_wh)
    root = kwargs.pop("root_dir")
    split = kwargs.pop("split")
    dataset = dataset_dict[args.dataset_name](root, split=split, **kwargs)

    params = load_params(args.ckpt_path)
    settings = RenderSettings(
        n_samples=args.N_samples,
        n_importance=args.N_importance,
        use_disp=args.use_disp,
        perturb=0.0,
        noise_std=0.0,
        white_back=dataset.white_back,
        compute_dtype=args.compute_dtype,
        mlp_impl=args.mlp_impl,
    )

    dir_name = f'results/{args.dataset_name}/{args.scene_name}/{args.timestamp}'
    os.makedirs(dir_name, exist_ok=True)

    # multi-chip: shard the ray axis of each image over a data mesh
    mesh = None
    n_chips = getattr(args, "num_gpus", 1)
    if n_chips > 1:
        import jax

        from sinnerf_tpu.parallel.mesh import make_mesh, replicate

        if len(jax.devices()) >= n_chips:
            mesh = make_mesh(n_chips)
            params = replicate(params, mesh)
        else:
            print(f"[parallel] requested {n_chips} chips but only "
                  f"{len(jax.devices())} present; rendering single-chip")
            n_chips = 1
    tile = pick_val_tile(w * h, args.chunk, n_chips)

    imgs, psnrs = [], []
    for i in range(dataset.val_len()):
        sample = dataset.val_item(i)
        rays = jnp.asarray(sample["rays"])
        if mesh is not None:
            results = render_chunked_sharded(params, rays, settings, mesh, tile=tile)
        else:
            results = render_chunked(params, rays, settings, tile=tile)
        img_pred = np.asarray(results["rgb_fine"]).reshape(h, w, 3)
        # name renders after the source image when the dataset provides one
        # (reference eval.py:163-166) — LLFF test_train renders are file-level
        # comparable with the reference's
        if "fname" in sample:
            # exact reference formula: only .JPG is stripped (eval.py:164)
            fname = os.path.basename(sample["fname"]).replace('.JPG', '')
        else:
            fname = f'{i:03d}'

        if args.save_depth:
            depth_pred = np.nan_to_num(
                np.asarray(results["depth_fine"]).reshape(h, w)
            )
            if args.depth_format == 'pfm':
                save_pfm(os.path.join(dir_name, f'depth_{fname}.pfm'), depth_pred)
            elif args.depth_format == 'npy':
                np.save(os.path.join(dir_name, f'{fname}.npy'), depth_pred)
            else:
                depth_img = (visualize_depth(depth_pred).transpose(1, 2, 0) * 255
                             ).astype(np.uint8)
                imageio.imwrite(
                    os.path.join(dir_name, f'{fname}_depth.png'), depth_img
                )

        img_pred_ = (np.clip(img_pred, 0, 1) * 255).astype(np.uint8)
        imgs.append(img_pred_)
        imageio.imwrite(os.path.join(dir_name, f'{fname}.png'), img_pred_)

        if "rgbs" in sample:
            # both arrays are already host numpy; -10*log10(mse) on host
            # (metrics.py:14-15) — re-uploading them over the axon tunnel
            # just to average a squared difference costs a jit compile plus
            # two transfers per image
            img_gt = np.asarray(sample["rgbs"]).reshape(h, w, 3)
            mse = np.mean((img_pred - img_gt) ** 2)
            psnrs.append(float(-10.0 * np.log10(mse)))

    imageio.mimsave(
        os.path.join(dir_name, f'{args.scene_name}.gif'), imgs, fps=5
    )

    if psnrs:
        mean_psnr = float(np.mean(psnrs))
        print(f'Mean PSNR : {mean_psnr:.2f}')
        return mean_psnr
    return None


if __name__ == "__main__":
    main(get_opts())
