#!/bin/bash
# Round-5 chip queue: serializes all real-TPU work behind a tunnel-wait.
#   1. convergence gate (verify discipline: train-path conditional touched)
#   2. bench.py default (production approx s=2) + --exact reconfirm
#   3. VERDICT r4 #7: short synth training of FlowNet1S_irr_occ_bi
#      (iteration-axis IRR + occ decoders + MultiScaleEPE_FlowNet_IRR_Bi_Occ,
#      none exercised by the IRR_PWC curriculum; reference recipe family:
#      scripts/flownet1s_irr2.sh / IRR-FlowNet_flyingChairsOcc.sh)
# Logs to /tmp/chip_queue_r5.log.
set -xe
exec >>/tmp/chip_queue_r5.log 2>&1
cd "$(dirname "$0")/.."

# ---- 0. wait for the tunnel (probe in a subprocess; dead tunnel HANGS) --
for i in $(seq 1 90); do
  if timeout 300 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((4,))*3)[0]))"; then
    echo "tunnel alive after attempt $i"; break
  fi
  echo "tunnel dead (attempt $i), sleeping 120s"; sleep 120
  if [ "$i" = 90 ]; then echo "tunnel never came back"; exit 7; fi
done

echo "=== 1. convergence gate ==="
IRR_TPU_SLOW_TESTS=1 IRR_TPU_TEST_ON_TPU=1 \
  timeout 1200 python -m pytest tests/test_convergence.py -x -q

echo "=== 2a. bench default (production approx s=2) ==="
timeout 900 python bench.py
echo "=== 2b. bench --exact ==="
timeout 900 python bench.py --exact

echo "=== 3. FlowNet1S_irr_occ_bi short synth training (VERDICT #7) ==="
ROOT=/tmp/chairs_occ_synth
SUB=/tmp/chairs_occ_1850
CACHE=/tmp/synth_decode_cache_fn1s
SAVE=experiments/flownet1s_irr_occ_bi_r5
ROOT="$ROOT" SUB="$SUB" bash scripts/ensure_synth_data.sh
timeout 7200 python main.py \
  --batch_size=4 --batch_size_val=4 \
  --compute_dtype=bfloat16 \
  --model=FlowNet1S_irr_occ_bi --num_iters=2 \
  --optimizer=Adam --optimizer_lr=1e-4 --optimizer_weight_decay=4e-4 \
  --total_epochs=4 \
  --training_dataset=FlyingChairsOccTrain \
  --training_dataset_root="$SUB" \
  --training_dataset_photometric_augmentations=True \
  --training_augmentation=RandomAffineFlowOcc \
  --training_loss=MultiScaleEPE_FlowNet_IRR_Bi_Occ \
  --validation_dataset=FlyingChairsOccValid \
  --validation_dataset_root="$SUB" \
  --validation_dataset_photometric_augmentations=False \
  --validation_loss=MultiScaleEPE_FlowNet_IRR_Bi_Occ \
  --validation_key=epe \
  --num_workers=1 --data_parallel_devices=1 \
  --dataset_resident=True --decode_cache_dir="$CACHE" \
  --save_every_batches=200 \
  --save="$SAVE"
echo "=== queue r5 done ==="
