#!/bin/bash
# Synthetic stage-3: KITTI sparse fine-tune — the role of reference
# scripts/IRR-PWC_kitti_train.sh:20-48 (warm-start from the previous
# stage's best checkpoint, lr 3e-5, RandomAffineFlowOccKITTI with the
# 320x896 post-crop, sparse valid-masked KITTI loss for train AND val,
# outlier metric reported at eval). This is the one curriculum stage the
# accuracy story had not yet exercised end to end: sparse GT, the
# masked-interp augmentation, per-image valid-count loss normalization,
# and the padded native-size eval with the Fl outlier rate.
#
# Data: synthetic KITTI-2015 layout (irr_tpu/data/synth.py generate_kitti)
# at real native frame sizes with a ramped sparse validity mask; n=200 so
# the frozen KITTI_2015_VALIDATE_INDICES split applies as-is (40 val).
#
# NB lr milestones are STAGE-RELATIVE (see train_synth_stage2.sh header).
#
# Usage: scripts/train_synth_stage3_kitti.sh [END_EPOCH]  (default 50;
# stage 2 ended at 40)
set -e
cd "$(dirname "$0")/.."

ROOT=${ROOT:-/tmp/kitti2015_synth}
CACHE=${CACHE:-/tmp/synth_decode_cache}
PREV=${PREV:-experiments/irr_pwc_synth_stage2_r3}
SAVE=${SAVE:-experiments/irr_pwc_synth_stage3_kitti_r4}
END=${1:-50}

if [ ! -f "$ROOT/data_scene_flow/training/flow_occ/000199_10.png" ]; then
  echo "generating synthetic KITTI-2015 scenes under $ROOT ..."
  python -m irr_tpu.data.synth --root="$ROOT" --layout=kitti2015 --n=200
fi
[ -f "$PREV/checkpoint_best.ckpt" ] || {
  echo "no stage-2 best checkpoint under $PREV — run train_synth_stage2.sh first"
  exit 1
}

# No --dataset_resident here: KITTI training re-crops 370x1224 per epoch
# in __getitem__ (datasets.py kitti_random_crop), which resident mode
# would freeze to one crop per sample. Threaded loader + decode cache
# keeps the 40-step epochs host-bound-free instead.
exec python scripts/supervise_train.py -- python main.py \
  --batch_size=4 --batch_size_val=4 \
  --compute_dtype=bfloat16 \
  --model=IRR_PWC --model_div_flow=0.05 \
  --checkpoint="$PREV" --checkpoint_mode=resume_from_best \
  --start_epoch=41 \
  --optimizer=Adam --optimizer_lr=3e-5 --optimizer_weight_decay=4e-4 \
  --lr_scheduler=MultiStepLR "--lr_scheduler_milestones=[5]" \
  --lr_scheduler_gamma=0.5 \
  --total_epochs="$END" \
  --training_dataset=KittiComb2015Train \
  --training_dataset_root="$ROOT" \
  --training_dataset_photometric_augmentations=True \
  --training_dataset_preprocessing_crop=True \
  --training_augmentation=RandomAffineFlowOccKITTI \
  --training_augmentation_crop="[320,896]" \
  --training_loss=MultiScaleEPE_PWC_Bi_Occ_upsample_KITTI \
  --validation_dataset=KittiComb2015Val \
  --validation_dataset_root="$ROOT" \
  --validation_dataset_photometric_augmentations=False \
  --validation_dataset_preprocessing_crop=False \
  --validation_loss=MultiScaleEPE_PWC_Bi_Occ_upsample_KITTI \
  --validation_key=epe \
  --num_workers=2 --data_parallel_devices=1 \
  --decode_cache_dir="$CACHE" \
  --save_every_batches=100 \
  --profile=True --save="$SAVE"
