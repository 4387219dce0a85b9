"""Train CLI — mirrors the reference ``train.py`` entry point.

Example (reference README.md:44-52, works unchanged):

    python train.py --dataset_name blender_ray_patch_1image_rot3d \
        --root_dir data/nerf_synthetic/lego --N_importance 64 --img_wh 400 400 \
        --num_epochs 2000 --batch_size 1 --optimizer adam --lr 2e-4 \
        --lr_scheduler steplr --decay_step 500 1000 --decay_gamma 0.5 \
        --exp_name lego_s4 --with_ref --patch_size 64 --sW 6 --sH 6 \
        --proj_weight 1 --depth_smooth_weight 0.5 --dis_weight 0 \
        --num_gpus 4 --load_depth --depth_type nerf --model sinnerf \
        --depth_weight 8 --vit_weight 10
"""

from opt import get_opts
from sinnerf_tpu.parallel.mesh import maybe_initialize_distributed
from sinnerf_tpu.utils.cache import enable_persistent_cache
from sinnerf_tpu.train import SinNeRFTrainer


def main(hparams):
    # multi-process topology (one process per host): env-gated, still before
    # any backend initializes (imports above touch no backend) but AFTER
    # argparse — a worker-host shell carrying the env trio must not block on
    # the coordinator for `--help` or a mistyped flag.  See
    # maybe_initialize_distributed for the contract.
    maybe_initialize_distributed()
    enable_persistent_cache()
    trainer = SinNeRFTrainer(hparams)
    best = trainer.fit()
    print(f"best val/psnr: {best:.3f}")
    return best


if __name__ == "__main__":
    main(get_opts())
