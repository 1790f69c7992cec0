#!/bin/bash
# Part 4: encoder level-shape A/B at CPU mini scale under the winning
# warmup schedule (C_warm recipe).  Candidate E_4x8b2 halves the
# per-sample gather/scatter ROW COUNT again (4 levels x 8 feats, block=2
# -> 27-cell 864 B rows) — the encoder is address-rate bound
# (BENCH_NOTES), so row count is the whole cost model.  Control re-runs
# the bench-default shape (8x4 blk3) at identical settings.
# Usage: quality_cpu_mini4.sh <arm>   with arm in {E_8x4b3, E_4x8b2}
set -u
OUT=/root/repo/output/quality_cpu_mini
mkdir -p "$OUT"
cd /root/repo

ARM=${1:?arm name}
case "$ARM" in
  E_8x4b3) SHAPE="--num_levels 8 --level_dim 4 --grid_block 3" ;;
  E_4x8b2) SHAPE="--num_levels 4 --level_dim 8 --grid_block 2" ;;
  *) echo "unknown arm $ARM"; exit 2 ;;
esac

ENERF_PLATFORM=cpu ENERF_TPU_INTERPRET=1 timeout 14000 \
  python /root/repo/main.py \
  --mode synthetic --events 1 --event_only 1 --out_dim_color 1 \
  --H 64 --W 64 --syn_frames 60 --syn_rich 2 --C_thres 0.2 \
  --bound 1.0 --scale 1.0 --lr 0.005 --fovy 60 \
  --cuda_ray --fp16 --batch_size_evs 2048 --num_rays 2048 \
  --march_samples 16 --compact_frac 0.5 --max_steps 512 --num_steps 48 \
  --val_idxs 10 --val_idxs 30 --val_idxs 50 \
  --outdir $OUT --ckpt scratch --expname "$ARM" \
  --ff --share_march 1 --negative_event_sampling 1 \
  --march_warmup 200 $SHAPE \
  --iters 1200 --eval_interval 8 --ckpt_interval 20 --log_every 200 \
  > "$OUT/$ARM.log" 2>&1
echo "done rc=$?"
grep -a "\[eval\]" "$OUT/$ARM.log" | tail -2
