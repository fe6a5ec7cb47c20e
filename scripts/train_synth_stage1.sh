#!/bin/bash
# Round-3 accuracy run (the role of reference scripts/IRR-PWC_flyingChairsOcc.sh):
# IRR-PWC stage-1 curriculum on the synthetic ChairsOcc set, resident in
# device HBM, kept alive across chip preemptions by scripts/supervise_train.py
# (mid-epoch checkpoints every 100 batches, exact opt-state resume).
#
# Regenerates the data + the 1850-sample HBM-resident subset if /tmp was
# wiped (the resident set must stay under ~6 GB on a 16 GB v5e, PERF.md).
#
# Usage: scripts/train_synth_stage1.sh [EPOCHS]
set -e
cd "$(dirname "$0")/.."

ROOT=${ROOT:-/tmp/chairs_occ_synth}
SUB=${SUB:-/tmp/chairs_occ_1850}
CACHE=${CACHE:-/tmp/synth_decode_cache}
SAVE=${SAVE:-experiments/irr_pwc_synth_stage1_r3}
EPOCHS=${1:-30}

if [ ! -f "$ROOT/02200_img2.png" ]; then
  echo "generating synthetic ChairsOcc scenes under $ROOT ..."
  python -m irr_tpu.data.synth --root="$ROOT" --n=2200 --seed=0
fi
if [ ! -e "$SUB/01850_occ2.png" ]; then
  mkdir -p "$SUB"
  python - "$ROOT" "$SUB" <<'EOF'
import os, sys
root, sub = sys.argv[1], sys.argv[2]
for i in range(1, 1851):
    for suf in ("img1.png", "img2.png", "occ1.png", "occ2.png",
                "flow.flo", "flow_b.flo"):
        src = os.path.join(root, "%05d_%s" % (i, suf))
        dst = os.path.join(sub, "%05d_%s" % (i, suf))
        if not os.path.lexists(dst):
            os.symlink(src, dst)
EOF
fi

exec python scripts/supervise_train.py -- python main.py \
  --batch_size=4 --batch_size_val=4 \
  --compute_dtype=bfloat16 \
  --model=IRR_PWC --model_div_flow=0.05 \
  --optimizer=Adam --optimizer_lr=1e-4 --optimizer_weight_decay=4e-4 \
  --lr_scheduler=MultiStepLR "--lr_scheduler_milestones=[15, 21, 26]" \
  --lr_scheduler_gamma=0.5 \
  --total_epochs="$EPOCHS" \
  --training_dataset=FlyingChairsOccTrain \
  --training_dataset_root="$SUB" \
  --training_dataset_photometric_augmentations=True \
  --training_augmentation=RandomAffineFlowOcc \
  --training_augmentation_addnoise=True \
  --training_loss=MultiScaleEPE_PWC_Bi_Occ_upsample \
  --validation_dataset=FlyingChairsOccValid \
  --validation_dataset_root="$SUB" \
  --validation_dataset_photometric_augmentations=False \
  --validation_loss=MultiScaleEPE_PWC_Bi_Occ_upsample \
  --validation_key=epe \
  --num_workers=1 --data_parallel_devices=1 \
  --dataset_resident=True --decode_cache_dir="$CACHE" \
  --save_every_batches=100 \
  --profile=True --save="$SAVE"
