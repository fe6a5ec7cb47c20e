#!/bin/bash
# irr_tpu training recipe — same CLI contract as the reference visinf/irr
# scripts (flag-for-flag); paths below must point at your local datasets.
set -e

EXPERIMENTS_HOME="experiments"
TIME=$(date +"%Y%m%d-%H%M%S")

KITTI_HOME="(YOUR PATH)/KITTI_flow/"

MODEL=IRR_PWC
EVAL_LOSS=MultiScaleEPE_PWC_Bi_Occ_upsample_KITTI
CHECKPOINT="saved_check_point/pwcnet/IRR-PWC_kitti/checkpoint_latest.ckpt"
SIZE_OF_BATCH=1
SAVE_PATH="saved_check_point/pwcnet/eval_temp/$MODEL"

python ../../main.py \
--batch_size=$SIZE_OF_BATCH \
--batch_size_val=$SIZE_OF_BATCH \
--checkpoint=$CHECKPOINT \
--evaluation=True \
--model=$MODEL \
--num_workers=4 \
--save=$SAVE_PATH \
--validation_dataset=KittiCombVal \
--validation_dataset_photometric_augmentations=False \
--validation_dataset_root=$KITTI_HOME \
--validation_key=epe \
--validation_loss=$EVAL_LOSS
