#!/bin/bash
# Round-4 post-training chip queue: waits for the supervised stage-1 run
# to finish (supervisor PID exits AND the checkpoint sidecar reached
# total_epochs), then runs the chip-serial evidence sequence back to
# back so no tunnel time is wasted between steps:
#   1. eval_synth_ckpt.sh        — exact/approx/grouped EPE+F1 -> RESULTS.md
#   2. repro_f1_nan.py --pad     — on-chip witness that the padded eval
#                                  executable is NaN-free on the tail batch
#   3. bench.py (exact)          — headline pairs/s
#   4. bench.py --approx-guidance
#   5. bench.py --grouped-towers
#   6. convergence gate on the real chip (IRR_TPU_SLOW_TESTS=1)
#
# Usage: nohup bash scripts/postrun_queue.sh <supervisor_pid> \
#          > /tmp/postrun.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
SUP_PID=${1:?usage: postrun_queue.sh <supervisor_pid>}
EXP=${EXP:-experiments/irr_pwc_synth_stage1_r3}
TOTAL=${TOTAL:-30}

echo "[queue] waiting for supervisor pid $SUP_PID ..."
while kill -0 "$SUP_PID" 2>/dev/null; do sleep 30; done
echo "[queue] supervisor exited at $(date -u)"

resume=$(python - <<EOF
import json
print(json.load(open("$EXP/checkpoint_latest.json")).get("resume_epoch", 0))
EOF
)
if [ "$resume" -le "$TOTAL" ]; then
  echo "[queue] run did NOT complete (resume_epoch=$resume <= $TOTAL) — aborting queue"
  exit 1
fi
echo "[queue] run complete (resume_epoch=$resume). Starting evidence sequence."

echo "[queue] === 1. three-mode eval ==="
bash scripts/eval_synth_ckpt.sh "$EXP" 2>&1 | tail -40

echo "[queue] === 2. padded-eval NaN witness (TPU) ==="
timeout 1200 python perf/repro_f1_nan.py --pad "$EXP" 2>&1 | tail -6

echo "[queue] === 3. bench exact ==="
# bench.py defaults to the production approx mode since r5 — exact needs the flag
timeout 1800 python bench.py --exact 2>&1 | tail -3

echo "[queue] === 4. bench approx-guidance ==="
timeout 1800 python bench.py --approx-guidance 2>&1 | tail -3

echo "[queue] === 5. bench grouped-towers ==="
timeout 1800 python bench.py --exact --grouped-towers 2>&1 | tail -3

echo "[queue] === 6. convergence gate (real chip) ==="
IRR_TPU_SLOW_TESTS=1 IRR_TPU_TEST_ON_TPU=1 \
  timeout 1800 python -m pytest tests/test_convergence.py -x -q 2>&1 | tail -5

echo "[queue] DONE at $(date -u)"
