#!/bin/bash
# Evaluate a trained checkpoint on the frozen synthetic ChairsOcc valid
# split (the parity role of reference scripts/validation/
# IRR-PWC_flyingChairs.sh:19-31), in three model modes:
#   exact           - the reference-exact path (the number for RESULTS.md)
#   approx          - quarter-density L5/L6 guidance warps (EPE cost of
#                     the opt-in --model_approx_guidance mode)
#   grouped         - grouped-conv towers (bit-exact in f32; in bf16 the
#                     different accumulation order costs measured EPE —
#                     RESULTS.md "Final evaluation")
# MODES="exact approx4 approx_refine ..." overrides the mode list:
#   approx4       - stride-4 guidance (16x fewer L5/L6 descriptors)
#   approx_refine - stride-2 guidance PLUS reduced-density L1-4
#                   refinement guidance warps (RefineFlow/RefineOcc error
#                   inputs; these sit upstream of the carried flow)
#
# Usage: scripts/eval_synth_ckpt.sh <experiment_dir> [dataset_root]
#   LAYOUT=kitti2015 evaluates on the synthetic KITTI-2015 valid split
#   instead (sparse masked loss, epe + Fl outlier, padded native sizes).

set -e
EXP=${1:?usage: eval_synth_ckpt.sh <experiment_dir> [dataset_root]}
LAYOUT=${LAYOUT:-chairs_occ}

if [ "$LAYOUT" = kitti2015 ]; then
  ROOT=${2:-/tmp/kitti2015_synth}
  dataset=(--validation_dataset=KittiComb2015Val
           --validation_dataset_preprocessing_crop=False
           --validation_loss=MultiScaleEPE_PWC_Bi_Occ_upsample_KITTI)
else
  ROOT=${2:-/tmp/chairs_occ_1850}
  dataset=(--validation_dataset=FlyingChairsOccValid
           --validation_loss=MultiScaleEPE_PWC_Bi_Occ_upsample)
fi

common=(--batch_size_val=4 --compute_dtype=bfloat16
        --model=IRR_PWC --model_div_flow=0.05
        "${dataset[@]}"
        --validation_dataset_root="$ROOT"
        --validation_dataset_photometric_augmentations=False
        --validation_key=epe --evaluation=True --num_workers=1
        --data_parallel_devices=1
        --checkpoint="$EXP" --checkpoint_mode=resume_from_best)

MODES=${MODES:-"exact approx grouped"}
for mode in $MODES; do
  case "$mode" in
    exact|approx|approx4|approx_refine|grouped) ;;
    *) echo "unknown mode '$mode' (valid: exact approx approx4 approx_refine grouped)"; exit 2 ;;
  esac
  extra=()
  [ "$mode" = approx ] && extra=(--model_approx_guidance=True)
  [ "$mode" = approx4 ] && extra=(--model_approx_guidance=True
                                  --model_approx_guidance_stride=4)
  [ "$mode" = approx_refine ] && extra=(--model_approx_guidance=True
                                        --model_approx_refine_guidance=True)
  [ "$mode" = grouped ] && extra=(--model_grouped_towers=True)
  echo "=== mode: $mode ==="
  python main.py "${common[@]}" "${extra[@]}" --save="$EXP/eval_$mode" \
    | grep -E "epe|F1|outlier" || true
done
