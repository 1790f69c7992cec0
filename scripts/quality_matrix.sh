#!/bin/bash
# Quality A/B matrix on the synthetic esim scene (TPU, sequential runs).
#
# Tests the round-2 quality hypotheses (VERDICT.md item 3):
#   - share_march: correlated pair sampling should cut delta-log noise and
#     fix the contrast under-fit (errors-in-variables attenuation)
#   - hashgrid vs blockgrid: rule the encoder's halo discontinuities in/out
#   - no-event loss: fog suppression
#
# Usage: bash scripts/quality_matrix.sh [outdir]
set -u
OUT=${1:-/root/repo/output/quality_r2}
mkdir -p "$OUT"

COMMON="--mode synthetic --events 1 --event_only 1 --out_dim_color 1
  --H 128 --W 128 --syn_frames 120 --syn_rich 1 --C_thres 0.2
  --bound 1.0 --scale 1.0 --lr 0.005 --fovy 60
  --cuda_ray --fp16 --batch_size_evs 8192 --num_rays 8192
  --march_samples 32 --compact_frac 0.5 --max_steps 1024
  --iters 3000 --eval_interval 5 --log_every 100
  --val_idxs 10 --val_idxs 35 --val_idxs 60 --val_idxs 85 --val_idxs 110
  --outdir $OUT --ckpt scratch"

run() {
  name=$1; shift
  echo "=== RUN $name: $* ==="
  timeout 4200 python /root/repo/main.py $COMMON --expname "$name" "$@" \
    > "$OUT/$name.log" 2>&1
  echo "=== $name done (rc=$?) ==="
  grep "\[eval\]" "$OUT/$name.log" | tail -3
}

cd /root/repo
run A_base      --ff
run B_share     --ff --share_march 1
run C_hashgrid  --share_march 1
run D_noev      --ff --share_march 1 --negative_event_sampling 1
echo "ALL RUNS DONE"
