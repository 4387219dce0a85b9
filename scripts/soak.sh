#!/bin/bash
# Full-recipe convergence soaks for the LLFF-room and DTU-scan4 recipes
# (/root/reference/README.md:59-86) on multi-view-consistent rich synthetic
# scenes (sinnerf_tpu/data/synthetic.py: make_llff_scene_rich /
# make_dtu_scene_rich — the real datasets are not obtainable in this
# environment, see README "Hardware results").
#
# Usage: scripts/soak.sh llff|dtu|lego|llff_vit0 [epochs_step1] [epochs_step2]
# Runs Step-1 (depth+proj+ViT), then Step-2 (GAN finetune warm-started from
# the Step-1 checkpoint via --pt_model --nerf_only), then eval.py on the
# Step-2 checkpoint.  TPU jobs are serial (single axon tunnel).
#
# CAVEAT: Step-1 passes `--vit_weight 10 --allow_random_pretrained` — DINO
# weights are unobtainable (zero egress), so the ViT semantic loss trains
# against a RANDOMLY INITIALIZED ViT.  That exercises the full ViT
# forward/cache/refresh path but supplies no semantic supervision; the soak
# PSNRs evidence the pipeline, not DINO-supervised quality (see README
# "Hardware results").
set -euo pipefail
cd "$(dirname "$0")/.."

FAMILY=${1:?usage: soak.sh llff|dtu|lego|llff_vit0 [epochs1] [epochs2]}
# blender epochs are 125 steps each (125-pose bank), so the lego defaults
# are epoch counts matching the round-2/3 evidence scale (20k + 2.5k steps);
# the published recipe's full 2000 epochs = 250k steps ~ 9 h.
if [ "$FAMILY" = lego ]; then
  E1=${2:-160}
  E2=${3:-20}
else
  E1=${2:-2000}
  E2=${3:-2000}
fi
CK=/tmp/soak_ck
LOG=/tmp/soak_log

if [ "$FAMILY" = llff ] || [ "$FAMILY" = llff_vit0 ]; then
  ROOT=/tmp/rich_llff
  [ -d "$ROOT" ] || python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
from sinnerf_tpu.data.synthetic import make_llff_scene_rich
make_llff_scene_rich('$ROOT', img_wh=(504, 378), n_images=10)"
  COMMON=(--dataset_name llff_ray_patch_1image_proj --root_dir "$ROOT"
    --N_importance 64 --img_wh 504 378 --batch_size 1 --optimizer adam
    --lr_scheduler steplr --decay_step 500 1000 --decay_gamma 0.5
    --with_ref --patch_size_x 63 --patch_size_y 84 --proj_weight 1
    --depth_smooth_weight 0 --num_gpus 1 --load_depth --depth_type nerf
    --model sinnerf --depth_weight 8 --ckpt_dir "$CK" --log_dir "$LOG"
    --check_val_every_n_epoch 50)
  if [ "$FAMILY" = llff_vit0 ]; then
    # Round-5 control (README "Caveat (random-ViT)"): identical Step-1 but
    # --vit_weight 0, bounding what the random-ViT noise regularizer
    # contributes to the Step-1 soak PSNR.  Step-1 only — no Step-2/eval leg.
    EXP1=llff_room_s4_vit0
    S1=(--num_epochs "$E1" --lr 2e-4 --sW 4 --sH 4 --dis_weight 0
      --vit_weight 0 --exp_name llff_room_s4_vit0)
    STEP1_ONLY=1
  else
  EXP1=llff_room_s4 EXP2=llff_room_s4_2ft
  S1=(--num_epochs "$E1" --lr 2e-4 --sW 4 --sH 4 --dis_weight 0
    --vit_weight 10 --allow_random_pretrained --exp_name llff_room_s4)
  S2=(--num_epochs "$E2" --lr 5e-5 --sW 2 --sH 2 --dis_weight 0.01
    --vit_weight 0 --exp_name llff_room_s4_2ft
    --pt_model "$CK/llff_room_s4/last" --nerf_only)
  EVAL=(--dataset_name llff_ray_patch_1image_proj --root_dir "$ROOT"
    --N_importance 64 --img_wh 504 378 --split test_train
    --ckpt_path "$CK/llff_room_s4_2ft/last" --timestamp soak)
  fi
elif [ "$FAMILY" = lego ]; then
  ROOT=/tmp/rich_lego/lego   # 'lego' in the path selects the my_testset branch
  [ -d "$ROOT" ] || python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
from sinnerf_tpu.data.synthetic import make_blender_scene_rich
make_blender_scene_rich('$ROOT', img_wh=(400, 400))"
  COMMON=(--dataset_name blender_ray_patch_1image_rot3d --root_dir "$ROOT"
    --N_importance 64 --img_wh 400 400 --batch_size 1 --optimizer adam
    --lr_scheduler steplr --decay_step 500 1000 --decay_gamma 0.5
    --with_ref --patch_size 64 --proj_weight 1
    --depth_smooth_weight 0 --num_gpus 1 --load_depth --depth_type nerf
    --model sinnerf --depth_weight 8 --ckpt_dir "$CK" --log_dir "$LOG"
    --check_val_every_n_epoch 10)
  EXP1=lego_s6 EXP2=lego_s6_4ft
  S1=(--num_epochs "$E1" --lr 2e-4 --sW 6 --sH 6 --dis_weight 0
    --vit_weight 10 --allow_random_pretrained --exp_name lego_s6)
  S2=(--num_epochs "$E2" --lr 5e-5 --sW 4 --sH 4 --dis_weight 0.01
    --vit_weight 0 --exp_name lego_s6_4ft
    --pt_model "$CK/lego_s6/last" --nerf_only)
  EVAL=(--dataset_name blender_ray_patch_1image_rot3d --root_dir "$ROOT"
    --N_importance 64 --img_wh 400 400 --split val
    --ckpt_path "$CK/lego_s6_4ft/last" --timestamp soak)
elif [ "$FAMILY" = dtu ]; then
  ROOT=/tmp/rich_dtu
  [ -d "$ROOT" ] || python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
from sinnerf_tpu.data.synthetic import make_dtu_scene_rich
make_dtu_scene_rich('$ROOT', img_wh=(640, 512), n_src=8)"
  COMMON=(--dataset_name dtu_proj --root_dir "$ROOT" --scan 4
    --N_importance 64 --img_wh 640 512 --batch_size 1 --optimizer adam
    --lr_scheduler steplr --decay_step 500 1000 --decay_gamma 0.5
    --with_ref --patch_size_y 70 --patch_size_x 56 --proj_weight 1
    --depth_smooth_weight 0 --num_gpus 1 --load_depth --depth_type nerf
    --model sinnerf --depth_weight 8 --ckpt_dir "$CK" --log_dir "$LOG"
    --check_val_every_n_epoch 50)
  EXP1=dtu_scan4_s8 EXP2=dtu_scan4_s8_4ft
  S1=(--num_epochs "$E1" --lr 2e-4 --sW 8 --sH 8 --dis_weight 0
    --vit_weight 10 --allow_random_pretrained --exp_name dtu_scan4_s8)
  S2=(--num_epochs "$E2" --lr 5e-5 --sW 4 --sH 4 --dis_weight 0.01
    --vit_weight 0 --exp_name dtu_scan4_s8_4ft
    --pt_model "$CK/dtu_scan4_s8/last" --nerf_only)
  EVAL=(--dataset_name dtu_proj --root_dir "$ROOT" --scan 4
    --N_importance 64 --img_wh 640 512 --split val
    --ckpt_path "$CK/dtu_scan4_s8_4ft/last" --timestamp soak)
else
  echo "unknown family: $FAMILY" >&2; exit 2
fi

# The axon tunnel occasionally drops a remote-compile response mid-read
# (INTERNAL: response body closed...); retry, resuming from the last
# checkpoint when one exists.
run_train() {
  local exp=$1; shift
  local attempt
  for attempt in 1 2 3 4; do
    local extra=()
    [ -d "$CK/$exp/last" ] && extra=(--ckpt_path "$CK/$exp/last")
    local rc=0
    python train.py "$@" "${extra[@]}" && return 0 || rc=$?
    echo "--- train $exp attempt $attempt failed (rc=$rc); retrying ---"
    sleep 30
  done
  echo "train $exp failed after 4 attempts" >&2
  return 1
}

echo "=== $FAMILY Step-1 ($E1 epochs) ==="
run_train "$EXP1" "${COMMON[@]}" "${S1[@]}"
if [ "${STEP1_ONLY:-0}" = 1 ]; then
  echo "=== $FAMILY is a Step-1-only control; done ==="
  exit 0
fi
echo "=== $FAMILY Step-2 ($E2 epochs) ==="
run_train "$EXP2" "${COMMON[@]}" "${S2[@]}"
echo "=== $FAMILY eval.py on the Step-2 checkpoint ==="
python eval.py "${EVAL[@]}"
