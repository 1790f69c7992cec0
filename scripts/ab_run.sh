#!/bin/bash
# Head-to-head quality A/B vs the reference (round-3 item 1; extended in
# round 4 to a second operating point — VERDICT r4 item 3).
#
# Per scene (smooth / textured), on the SAME shared esim dataset
# (output/ab_data, scripts/make_ab_dataset.py) with the SAME config file
# (configs/ab_mini/<scene>/<scene>_enerf<suffix>.txt), at EQUAL iters:
#   REF : the reference's own main_nerf.py via scripts/ab_reference.py
#         (functional CPU stubs; real hashgrid backbone)
#   OURS: main.py (this framework)
# then computes plain + corrected PSNR/SSIM for BOTH from the saved final
# validation renders with ONE implementation (scripts/ab_metrics.py).
# Equal-wall-clock columns come from scripts/ab_wallclock.py, which reads
# the per-epoch render mtimes both sides leave behind.
#
# Usage: bash scripts/ab_run.sh <scene> [ref|ours|metrics|all] [variant]
#   variant: "" (round-3 operating point, 1500 iters) or "acc"
#            (accumulation arm, 4500 iters — the reference's
#            provider.py:1364-1405 path on both sides)
# Output dir: $AB_OUT (default output/ab_r3 for the round-3 point).
set -u
SCENE=${1:?scene (smooth|textured)}
WHAT=${2:-all}
VARIANT=${3:-}
SUF=${VARIANT:+_$VARIANT}
cd /root/repo
OUT=${AB_OUT:-output/ab_r3}
CFG=configs/ab_mini/$SCENE/${SCENE}_enerf${SUF}.txt
DATA=$(pwd)/output/ab_data/$SCENE
mkdir -p "$OUT"

if [ "$WHAT" = ref ] || [ "$WHAT" = all ]; then
  echo "=== REF $SCENE$SUF ==="
  timeout 28800 python scripts/ab_reference.py -- \
    --config "$CFG" --datadir "$DATA" \
    --outdir "$OUT/ref" --expweek ab --expname "$SCENE$SUF" \
    > "$OUT/ref_$SCENE$SUF.log" 2>&1
  echo "ref rc=$?"
fi

if [ "$WHAT" = ours ] || [ "$WHAT" = all ]; then
  echo "=== OURS $SCENE$SUF ==="
  # ours runs its production stack on its target hardware (TPU, --ff
  # blockgrid + fused head + bf16) — the A/B compares FRAMEWORKS on equal
  # data/loss/config/iters; quality at equal iters is hardware-independent
  # (the reference cannot run on TPU, we cannot run CUDA; each side gets
  # its production backend)
  timeout 21600 python main.py \
    --config "$CFG" --datadir "$DATA" \
    --outdir "$OUT/ours" --expweek ab --expname "$SCENE$SUF" \
    --eval_interval 3 --ff --fp16 \
    > "$OUT/ours_$SCENE$SUF.log" 2>&1
  echo "ours rc=$?"
fi

if [ "$WHAT" = metrics ] || [ "$WHAT" = all ]; then
  echo "=== METRICS $SCENE$SUF ==="
  # reference side: RAW (uncorrected) final-epoch renders, corrected by the
  # SAME shared implementation as ours; gt pngs are epoch-independent
  # reference leaf dir = <expname>_<config stem> (utils.py:393-398) —
  # expname differs between launch styles; glob the single leaf instead
  REF_WS=$(ls -d "$OUT"/ref/ab/"$SCENE$SUF"/ab_mini/*_"${SCENE}"_enerf${SUF} 2>/dev/null | head -1)
  REF_LAST=$(ls "$REF_WS/validation/raw/" 2>/dev/null \
    | sed -E 's/.*_ep([0-9]+)_.*/\1/' | sort -n | tail -1)
  REF_GT_EP=$(ls "$REF_WS/validation/gt/" \
    | sed -E 's/.*_ep([0-9]+)_.*/\1/' | sort -n | tail -1)
  python scripts/ab_metrics.py \
    --pred "$REF_WS/validation/raw/*_ep${REF_LAST}_*.npy" \
    --gt   "$REF_WS/validation/gt/*_ep${REF_GT_EP}_*_gt.png" \
    --label "ref_$SCENE$SUF" | tee -a "$OUT/results.jsonl"
  OURS_WS=$OUT/ours/ab/$SCENE$SUF
  OURS_LAST=$(ls "$OURS_WS/validation/prediction/" \
    | sed -E 's/ep([0-9]+)_.*/\1/' | sort -n | tail -1)
  python scripts/ab_metrics.py \
    --pred "$OURS_WS/validation/prediction/ep${OURS_LAST}_*.png" \
    --gt   "$OURS_WS/validation/gt/*.png" \
    --label "ours_$SCENE$SUF" | tee -a "$OUT/results.jsonl"
fi
