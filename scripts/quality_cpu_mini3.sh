#!/bin/bash
# Part 3: extend the winning warmup schedule 3.3x longer (is the 14.3 dB
# 64x64 score schedule-limited or information-limited?)
set -u
OUT=/root/repo/output/quality_cpu_mini
cd /root/repo
ENERF_PLATFORM=cpu ENERF_TPU_INTERPRET=1 timeout 14000 \
  python /root/repo/main.py \
  --mode synthetic --events 1 --event_only 1 --out_dim_color 1 \
  --H 64 --W 64 --syn_frames 60 --syn_rich 2 --C_thres 0.2 \
  --bound 1.0 --scale 1.0 --lr 0.005 --fovy 60 \
  --cuda_ray --fp16 --batch_size_evs 2048 --num_rays 2048 \
  --march_samples 16 --compact_frac 0.5 --max_steps 512 --num_steps 48 \
  --val_idxs 10 --val_idxs 30 --val_idxs 50 \
  --outdir $OUT --ckpt scratch --expname C_warm_long \
  --ff --share_march 1 --negative_event_sampling 1 \
  --march_warmup 200 \
  --iters 4000 --eval_interval 8 --ckpt_interval 20 --log_every 200 \
  > "$OUT/C_warm_long.log" 2>&1
echo "done rc=$?"
grep -a "\[eval\]" "$OUT/C_warm_long.log" | tail -2
