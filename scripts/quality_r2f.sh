#!/bin/bash
# Round-2f: the FINAL long quality run of round 2.
#
# Scene: textured synthetic (syn_rich 2 — event supervision information-
# sufficient, like the reference's real esim rooms).
# Schedule: --march_warmup (uniform fixed-step carve, from the J_fixed
# finding) then the production march path; 12k iters with the lr decay
# horizon matched.
# Config details (encoder shape etc.) set from the r2e arm results.
set -u
OUT=${1:-/root/repo/output/quality_r2f}
EXTRA=${2:-}
mkdir -p "$OUT"
cd /root/repo

# bench-default-flip gate: march_warmup + the 8x4xblk3 level shape,
# textured scene — confirms the r2e M_tex8==M_tex parity result holds
# under the warmup schedule before bench.py defaults flip to the 1.44x
# configuration (BENCH_NOTES.md r2d sweep)
echo "=== RUN M_texwarm8 ==="
timeout 5400 python /root/repo/main.py \
  --mode synthetic --events 1 --event_only 1 --out_dim_color 1 \
  --H 128 --W 128 --syn_frames 120 --syn_rich 2 --C_thres 0.2 \
  --bound 1.0 --scale 1.0 --lr 0.005 --fovy 60 \
  --cuda_ray --fp16 --batch_size_evs 8192 --num_rays 8192 \
  --march_samples 32 --compact_frac 0.5 --max_steps 1024 --num_steps 128 \
  --val_idxs 10 --val_idxs 35 --val_idxs 60 --val_idxs 85 --val_idxs 110 \
  --outdir /root/repo/output/quality_r2e --ckpt scratch --expname M_texwarm8 \
  --ff --share_march 1 --negative_event_sampling 1 \
  --num_levels 8 --level_dim 4 --grid_block 3 --march_warmup 2000 \
  --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200 \
  > /root/repo/output/quality_r2e/M_texwarm8.log 2>&1
echo "=== M_texwarm8 done (rc=$?) ==="
grep "\[eval\]" /root/repo/output/quality_r2e/M_texwarm8.log | tail -2

echo "=== RUN N_final ==="
timeout 10800 python /root/repo/main.py \
  --mode synthetic --events 1 --event_only 1 --out_dim_color 1 \
  --H 128 --W 128 --syn_frames 120 --syn_rich 2 --C_thres 0.2 \
  --bound 1.0 --scale 1.0 --lr 0.005 --fovy 60 \
  --cuda_ray --fp16 --batch_size_evs 8192 --num_rays 8192 \
  --march_samples 32 --compact_frac 0.5 --max_steps 1024 --num_steps 128 \
  --val_idxs 10 --val_idxs 35 --val_idxs 60 --val_idxs 85 --val_idxs 110 \
  --outdir "$OUT" --ckpt scratch --expname N_final \
  --ff --share_march 1 --negative_event_sampling 1 \
  --march_warmup 2000 \
  --iters 12000 --eval_interval 20 --ckpt_interval 20 --log_every 500 \
  $EXTRA \
  > "$OUT/N_final.log" 2>&1
echo "=== N_final done (rc=$?) ==="
grep "\[eval\]" "$OUT/N_final.log" | tail -3
echo "ALL R2F DONE"
