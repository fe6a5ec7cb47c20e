#!/bin/bash
# Round-4 second chip queue: measure the two NEW approx variants
# (stride-4 L5/L6 guidance; reduced-density L1-4 refine guidance) for
# throughput AND EPE/F1 cost on the trained stage-1 checkpoint.
# Serializes all chip work; logs to /tmp/chip_queue_r4b.log.
set -xe
exec >>/tmp/chip_queue_r4b.log 2>&1
cd "$(dirname "$0")/.."

echo "=== bench exact (re-confirm) ==="
timeout 900 python bench.py
echo "=== bench approx stride 4 ==="
timeout 900 python bench.py --approx-guidance-stride 4
echo "=== bench approx refine (stride 2 + refine warps) ==="
timeout 900 python bench.py --approx-refine

ROOT=/tmp/chairs_occ_synth
SUB=/tmp/chairs_occ_1850
if [ ! -f "$ROOT/02200_img2.png" ]; then
  echo "regenerating synthetic ChairsOcc scenes (seed 0, bit-identical) ..."
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

echo "=== eval approx4 + approx_refine on stage-1 best ==="
MODES="approx4 approx_refine" timeout 2400 \
  bash scripts/eval_synth_ckpt.sh experiments/irr_pwc_synth_stage1_r3
echo "=== queue done ==="
