#!/bin/bash
# CPU mini-matrix part 2 (C_base done: 13.07 dB corrected @2k iters).
# Warmup arms rescaled for CPU: 200-step uniform carve, 1200 total iters.
set -u
OUT=/root/repo/output/quality_cpu_mini
mkdir -p "$OUT"
cd /root/repo

COMMON="--mode synthetic --events 1 --event_only 1 --out_dim_color 1
  --H 64 --W 64 --syn_frames 60 --syn_rich 2 --C_thres 0.2
  --bound 1.0 --scale 1.0 --lr 0.005 --fovy 60
  --cuda_ray --fp16 --batch_size_evs 2048 --num_rays 2048
  --march_samples 16 --compact_frac 0.5 --max_steps 512 --num_steps 48
  --val_idxs 10 --val_idxs 30 --val_idxs 50
  --outdir $OUT --ckpt scratch"

run() {
  name=$1; shift
  echo "=== RUN $name: $* ==="
  ENERF_PLATFORM=cpu ENERF_TPU_INTERPRET=1 timeout 6000 \
    python /root/repo/main.py $COMMON \
    --expname "$name" "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name done (rc=$?) ==="
  grep "\[eval\]" "$OUT/$name.log" | tail -1
}

run C_warm --ff --share_march 1 --negative_event_sampling 1 \
  --march_warmup 200 \
  --iters 1200 --eval_interval 4 --log_every 100
run C_warmdist --ff --share_march 1 --negative_event_sampling 1 \
  --march_warmup 200 --w_distortion 0.002 \
  --iters 1200 --eval_interval 4 --log_every 100
echo "ALL CPU MINI2 DONE"
