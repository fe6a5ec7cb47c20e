#!/bin/bash
# irr_tpu training recipe — same CLI contract as the reference visinf/irr
# scripts (flag-for-flag); paths below must point at your local datasets.
set -e

EXPERIMENTS_HOME="experiments"
TIME=$(date +"%Y%m%d-%H%M%S")

KITTI_HOME="(YOUR PATH)/KITTI_flow/"

MODEL=IRR_PWC
EVAL_LOSS=MultiScaleEPE_PWC_Bi_Occ_upsample_KITTI
CHECKPOINT="saved_check_point/IRR-PWC_things3d/checkpoint_latest.ckpt"
SIZE_OF_BATCH=4
SAVE_PATH="$EXPERIMENTS_HOME/$MODEL-$TIME"

python ../main.py \
--batch_size=$SIZE_OF_BATCH \
--batch_size_val=1 \
--checkpoint=$CHECKPOINT \
--lr_scheduler=MultiStepLR \
--lr_scheduler_gamma=0.5 \
--lr_scheduler_milestones="[730, 984, 1238, 1365, 1397, 1429, 1556, 1683, 1810, 1937]" \
--model=$MODEL \
--num_workers=4 \
--optimizer=Adam \
--optimizer_lr=3e-05 \
--optimizer_weight_decay=4e-4 \
--save=$SAVE_PATH \
--start_epoch=160 \
--total_epochs=2064 \
--training_augmentation=RandomAffineFlowOccKITTI \
--training_augmentation_crop="[320,896]" \
--training_dataset_preprocessing_crop=True \
--validation_dataset_preprocessing_crop=False \
--training_dataset=KittiCombTrain \
--training_dataset_photometric_augmentations=True \
--training_dataset_root=$KITTI_HOME \
--training_key=total_loss \
--training_loss=$EVAL_LOSS \
--validation_dataset=KittiCombVal \
--validation_dataset_photometric_augmentations=False \
--validation_dataset_root=$KITTI_HOME \
--validation_key=epe \
--validation_loss=$EVAL_LOSS
