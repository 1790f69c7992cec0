#!/bin/bash
# Round-2d TPU session (run after quality_r2c finishes):
#   1. bench sweep of the round-2b variants: bf16 row gathers (new default),
#      level-shape ablation (8x4 blk3), share_march — picks the bench default
#   2. G_l8c4 quality run: the D_noev winner config with --num_levels 8
#      --level_dim 4 --grid_block 3 (equal params/row, half the gathers) —
#      gates the level-shape default
#
# Usage: bash scripts/quality_r2d.sh [outdir]
set -u
OUT=${1:-/root/repo/output/quality_r2d}
mkdir -p "$OUT"
cd /root/repo

echo "=== bench: default (blk4, bf16 gather ON) ==="
timeout 1800 python bench.py 2>&1 | tail -1
echo "=== bench: bf16 gather OFF (round-2a state) ==="
timeout 1800 python bench.py --bf16_gather 0 2>&1 | tail -1
echo "=== bench: 8x4 blk3 ==="
timeout 1800 python bench.py --num_levels 8 --level_dim 4 --grid_block 3 2>&1 | tail -1
echo "=== bench: 8x4 blk3 + share ==="
timeout 1800 python bench.py --num_levels 8 --level_dim 4 --grid_block 3 --share_march 1 2>&1 | tail -1
echo "=== bench: share ==="
timeout 1800 python bench.py --share_march 1 2>&1 | tail -1

COMMON="--mode synthetic --events 1 --event_only 1 --out_dim_color 1
  --H 128 --W 128 --syn_frames 120 --syn_rich 1 --C_thres 0.2
  --bound 1.0 --scale 1.0 --lr 0.005 --fovy 60
  --cuda_ray --fp16 --batch_size_evs 8192 --num_rays 8192
  --march_samples 32 --compact_frac 0.5 --max_steps 1024
  --val_idxs 10 --val_idxs 35 --val_idxs 60 --val_idxs 85 --val_idxs 110
  --outdir $OUT --ckpt scratch"

run() {
  name=$1; to=$2; shift 2
  echo "=== RUN $name: $* ==="
  timeout "$to" python /root/repo/main.py $COMMON --expname "$name" "$@" \
    > "$OUT/$name.log" 2>&1
  echo "=== $name done (rc=$?) ==="
  grep "\[eval\]" "$OUT/$name.log" | tail -2
}

run G_l8c4 5400 --ff --share_march 1 --negative_event_sampling 1 \
  --num_levels 8 --level_dim 4 --grid_block 3 \
  --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200
echo "ALL R2D DONE"
