#!/bin/bash
# Synthetic continuation of the curriculum (the role of reference
# scripts/IRR-PWC_sintel_train.sh: warm-start from the previous stage's
# best checkpoint, lower LR, robust Sintel fine-tune loss). Exercises the
# cross-stage contract end to end: params-only restore (fresh optimizer,
# --checkpoint_resume_optimizer stays False on the FIRST attempt; the
# supervisor's own resumes within this stage restore opt state), LR
# schedule continuation via --start_epoch, same frozen valid split.
#
# NB milestones are STAGE-RELATIVE: a fresh curriculum stage restarts the
# scheduler count from 0 (the reference's runtime.py:569 quirk, preserved
# in lr_scheduler.py) — so [5] here means "5 epochs into this stage",
# i.e. absolute epoch 36 with --start_epoch=31. The r4 stage-2 run shipped
# with [36] (absolute-style), which therefore never fired (RESULTS.md).
#
# Usage: scripts/train_synth_stage2.sh [END_EPOCH] (default 40; stage 1
# ended at 30)
set -e
cd "$(dirname "$0")/.."

SUB=${SUB:-/tmp/chairs_occ_1850}
CACHE=${CACHE:-/tmp/synth_decode_cache}
PREV=${PREV:-experiments/irr_pwc_synth_stage1_r3}
SAVE=${SAVE:-experiments/irr_pwc_synth_stage2_r3}
END=${1:-40}

[ -f "$PREV/checkpoint_best.ckpt" ] || {
  echo "no stage-1 best checkpoint under $PREV — run train_synth_stage1.sh first"
  exit 1
}

exec python scripts/supervise_train.py -- python main.py \
  --batch_size=4 --batch_size_val=4 \
  --compute_dtype=bfloat16 \
  --model=IRR_PWC --model_div_flow=0.05 \
  --checkpoint="$PREV" --checkpoint_mode=resume_from_best \
  --start_epoch=31 \
  --optimizer=Adam --optimizer_lr=1e-5 --optimizer_weight_decay=4e-4 \
  --lr_scheduler=MultiStepLR "--lr_scheduler_milestones=[5]" \
  --lr_scheduler_gamma=0.5 \
  --total_epochs="$END" \
  --training_dataset=FlyingChairsOccTrain \
  --training_dataset_root="$SUB" \
  --training_dataset_photometric_augmentations=True \
  --training_augmentation=RandomAffineFlowOcc \
  --training_augmentation_addnoise=True \
  --training_loss=MultiScaleEPE_PWC_Bi_Occ_upsample_Sintel \
  --validation_dataset=FlyingChairsOccValid \
  --validation_dataset_root="$SUB" \
  --validation_dataset_photometric_augmentations=False \
  --validation_loss=MultiScaleEPE_PWC_Bi_Occ_upsample \
  --validation_key=epe \
  --num_workers=1 --data_parallel_devices=1 \
  --dataset_resident=True --decode_cache_dir="$CACHE" \
  --save_every_batches=100 \
  --profile=True --save="$SAVE"
