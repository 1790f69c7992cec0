#!/bin/bash
# CPU mini-matrix during the TPU tunnel outage: 64x64 textured scene,
# reduced batch/samples.  Not official numbers — a qualitative de-risk of
# the march_warmup and w_distortion arms before they get TPU time.
set -u
OUT=${1:-/root/repo/output/quality_cpu_mini}
mkdir -p "$OUT"
cd /root/repo

COMMON="--mode synthetic --events 1 --event_only 1 --out_dim_color 1
  --H 64 --W 64 --syn_frames 60 --syn_rich 2 --C_thres 0.2
  --bound 1.0 --scale 1.0 --lr 0.005 --fovy 60
  --cuda_ray --fp16 --batch_size_evs 2048 --num_rays 2048
  --march_samples 16 --compact_frac 0.5 --max_steps 512 --num_steps 64
  --val_idxs 10 --val_idxs 30 --val_idxs 50
  --outdir $OUT --ckpt scratch"

run() {
  name=$1; shift
  echo "=== RUN $name: $* ==="
  ENERF_PLATFORM=cpu ENERF_TPU_INTERPRET=1 timeout 4800 \
    python /root/repo/main.py $COMMON \
    --expname "$name" "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name done (rc=$?) ==="
  grep "\[eval\]" "$OUT/$name.log" | tail -1
}

run C_base --ff --share_march 1 --negative_event_sampling 1 \
  --iters 2000 --eval_interval 5 --log_every 200
run C_warm --ff --share_march 1 --negative_event_sampling 1 \
  --march_warmup 800 \
  --iters 2000 --eval_interval 5 --log_every 200
run C_warmdist --ff --share_march 1 --negative_event_sampling 1 \
  --march_warmup 800 --w_distortion 0.002 \
  --iters 2000 --eval_interval 5 --log_every 200
echo "ALL CPU MINI DONE"
