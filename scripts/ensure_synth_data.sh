#!/bin/bash
# Regenerate the synthetic ChairsOcc dataset + the 1850-sample resident
# subset under /tmp if a wipe removed them. Shared by the chip queue and
# training scripts so the scene count/seed/naming live in ONE place
# (sourcing scripts rely on ROOT/SUB being exported or defaulted here).
set -e
ROOT=${ROOT:-/tmp/chairs_occ_synth}
SUB=${SUB:-/tmp/chairs_occ_1850}

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
