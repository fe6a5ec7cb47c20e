#!/bin/bash
# Round-5 chip queue C: IRR_FlowNet short synth training — training
# evidence for the FlowNet occ-upsample axis (reference
# IRR-FlowNet_flyingChairsOcc.sh recipe family) and first production
# training use of MultiScaleEPE_FlowNet_IRR_Bi_Occ_upsample.
# Logs to /tmp/chip_queue_r5c.log.
set -xe
exec >>/tmp/chip_queue_r5c.log 2>&1
cd "$(dirname "$0")/.."

for i in $(seq 1 90); do
  if timeout 300 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((4,))*3)[0]))"; then
    echo "tunnel alive after attempt $i"; break
  fi
  echo "tunnel dead (attempt $i), sleeping 120s"; sleep 120
  if [ "$i" = 90 ]; then echo "tunnel never came back"; exit 7; fi
done

ROOT=/tmp/chairs_occ_synth
SUB=/tmp/chairs_occ_1850
ROOT="$ROOT" SUB="$SUB" bash scripts/ensure_synth_data.sh
CACHE=/tmp/synth_decode_cache_irrfn
SAVE=experiments/irr_flownet_r5

timeout 7200 python main.py \
  --batch_size=4 --batch_size_val=4 \
  --compute_dtype=bfloat16 \
  --model=IRR_FlowNet --num_iters=2 \
  --optimizer=Adam --optimizer_lr=1e-4 --optimizer_weight_decay=4e-4 \
  --total_epochs=3 \
  --training_dataset=FlyingChairsOccTrain \
  --training_dataset_root="$SUB" \
  --training_dataset_photometric_augmentations=True \
  --training_augmentation=RandomAffineFlowOcc \
  --training_loss=MultiScaleEPE_FlowNet_IRR_Bi_Occ_upsample \
  --validation_dataset=FlyingChairsOccValid \
  --validation_dataset_root="$SUB" \
  --validation_dataset_photometric_augmentations=False \
  --validation_loss=MultiScaleEPE_FlowNet_IRR_Bi_Occ_upsample \
  --validation_key=epe \
  --num_workers=1 --data_parallel_devices=1 \
  --dataset_resident=True --decode_cache_dir="$CACHE" \
  --save_every_batches=200 \
  --save="$SAVE"
echo "=== queue r5b done ==="
