#!/bin/bash
# Round-4 second chip queue: waits for the TPU tunnel to come back
# (it dropped ~11:55 UTC after the convergence gate), then runs the
# remaining measurement items back to back:
#   1. bench.py --grouped-towers   (re-run; first attempt hit the outage)
#   2. perf/micro_towers3.py       (tower conv codegen reformulations)
#   3. perf/stage_shapes.py Things3D Sintel (curriculum timing rows)
#
# Usage: nohup bash scripts/chip_queue2.sh > /tmp/chipq2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "[q2] waiting for TPU tunnel ..."
while true; do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); assert float((x @ x).ravel()[0]) == 256.0
" 2>/dev/null; then
    break
  fi
  echo "[q2] probe failed at $(date -u +%H:%M:%S); retrying in 120s"
  sleep 120
done
echo "[q2] tunnel up at $(date -u)"

echo "[q2] === 1. bench grouped-towers ==="
# --exact: keep comparability with the recorded grouped-towers series
timeout 1800 python bench.py --exact --grouped-towers 2>&1 | tail -3

echo "[q2] === 2. tower codegen (micro_towers3) ==="
timeout 1800 python perf/micro_towers3.py 2>&1 | tail -12

echo "[q2] === 3. stage shapes Things3D Sintel ==="
timeout 1800 python perf/stage_shapes.py Things3D Sintel 2>&1 | tail -12

echo "[q2] DONE at $(date -u)"
