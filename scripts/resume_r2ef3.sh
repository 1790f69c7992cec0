#!/bin/bash
# Relaunch of the round-2e/2f queue after the warm-chunk OOM fix
# (train/step.py remat_fixed: the warmup program's four fixed-step
# renders now rematerialize — 25.8G -> fits 15.75G HBM).
# Order: headline long run first, then the default-flip gate arms.
set -u
OUT=/root/repo/output/quality_r2e
mkdir -p "$OUT" /root/repo/output/quality_r2f
cd /root/repo

echo "=== RUN N_final ==="
timeout 12600 python /root/repo/main.py \
  --mode synthetic --events 1 --event_only 1 --out_dim_color 1 \
  --H 128 --W 128 --syn_frames 120 --syn_rich 2 --C_thres 0.2 \
  --bound 1.0 --scale 1.0 --lr 0.005 --fovy 60 \
  --cuda_ray --fp16 --batch_size_evs 8192 --num_rays 8192 \
  --march_samples 32 --compact_frac 0.5 --max_steps 1024 --num_steps 128 \
  --val_idxs 10 --val_idxs 35 --val_idxs 60 --val_idxs 85 --val_idxs 110 \
  --outdir /root/repo/output/quality_r2f --ckpt scratch --expname N_final \
  --ff --share_march 1 --negative_event_sampling 1 \
  --march_warmup 1200 \
  --iters 12000 --eval_interval 20 --ckpt_interval 20 --log_every 500 \
  > /root/repo/output/quality_r2f/N_final.log 2>&1
echo "=== N_final done (rc=$?) ==="
grep -a "\[eval\]" /root/repo/output/quality_r2f/N_final.log | tail -3

COMMON="--mode synthetic --events 1 --event_only 1 --out_dim_color 1
  --H 128 --W 128 --syn_frames 120 --syn_rich 2 --C_thres 0.2
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
  grep -a "\[eval\]" "$OUT/$name.log" | tail -2
}

# bench-default-flip confirmation gate under the warmup schedule
run M_texwarm8 5400 --ff --share_march 1 --negative_event_sampling 1 \
  --num_levels 8 --level_dim 4 --grid_block 3 --march_warmup 1200 \
  --num_steps 128 \
  --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200
run M_texwarm 7200 --ff --share_march 1 --negative_event_sampling 1 \
  --march_warmup 1200 --num_steps 128 \
  --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200
# candidate encoder shape: 4 levels x 8 feats, block=2 (halves the
# address-bound gather/scatter row count AGAIN vs 8x4xblk3)
run M_texwarm4x8 5400 --ff --share_march 1 --negative_event_sampling 1 \
  --num_levels 4 --level_dim 8 --grid_block 2 --march_warmup 1200 \
  --num_steps 128 \
  --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200
# distortion regularizer arm (anti-mist; mip-NeRF-360 eq.15)
run M_texdist 5400 --ff --share_march 1 --negative_event_sampling 1 \
  --march_warmup 1200 --num_steps 128 --w_distortion 0.002 \
  --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200
echo "ALL R2E DONE"
