#!/bin/bash
# irr_tpu training recipe — same CLI contract as the reference visinf/irr
# scripts (flag-for-flag); paths below must point at your local datasets.
set -e

EXPERIMENTS_HOME="experiments"
TIME=$(date +"%Y%m%d-%H%M%S")

FLYINGCHAIRS_OCC_HOME="(YOUR PATH)/flow_occ_v5/data"

MODEL=FlowNet1S_irr
EVAL_LOSS=MultiScaleEPE_FlowNet_IRR
CHECKPOINT="saved_check_point/pwcnet/flownet1s_irr1/checkpoint_latest.ckpt"
SIZE_OF_BATCH=8
SAVE_PATH="saved_check_point/pwcnet/eval_temp/$MODEL"

python ../../main.py \
--batch_size=$SIZE_OF_BATCH \
--batch_size_val=$SIZE_OF_BATCH \
--checkpoint=$CHECKPOINT \
--evaluation=True \
--model=$MODEL \
--num_workers=4 \
--save=$SAVE_PATH \
--num_iters=1 \
--validation_dataset=FlyingChairsOccValid \
--validation_dataset_photometric_augmentations=False \
--validation_dataset_root=$FLYINGCHAIRS_OCC_HOME \
--validation_key=epe \
--validation_loss=$EVAL_LOSS
