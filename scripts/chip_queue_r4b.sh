#!/bin/bash
# Round-4 second chip queue: measure the two NEW approx variants
# (stride-4 L5/L6 guidance; reduced-density L1-4 refine guidance) for
# throughput AND EPE/F1 cost on the trained stage-1 checkpoint.
# Serializes all chip work; logs to /tmp/chip_queue_r4b.log.
set -xe
exec >>/tmp/chip_queue_r4b.log 2>&1
cd "$(dirname "$0")/.."

echo "=== bench exact (re-confirm) ==="
# bench.py defaults to the production approx mode since r5 — exact needs the flag
timeout 900 python bench.py --exact
echo "=== bench approx stride 4 ==="
timeout 900 python bench.py --approx-guidance-stride 4
echo "=== bench approx refine (stride 2 + refine warps) ==="
timeout 900 python bench.py --approx-refine

ROOT=/tmp/chairs_occ_synth
SUB=/tmp/chairs_occ_1850
ROOT="$ROOT" SUB="$SUB" bash scripts/ensure_synth_data.sh

echo "=== eval approx4 + approx_refine on stage-1 best ==="
MODES="approx4 approx_refine" timeout 2400 \
  bash scripts/eval_synth_ckpt.sh experiments/irr_pwc_synth_stage1_r3
echo "=== queue done ==="
