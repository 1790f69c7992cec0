#!/bin/bash
# Round-2 TPU work queue (resumed after session restart):
#   1. finish B_share from its epoch-25 checkpoint
#   2. run C_hashgrid and D_noev from the quality matrix
#   3. run the perf sweep (bench_sweep.sh)
set -u
OUT=/root/repo/output/quality_r2b
mkdir -p "$OUT"

COMMON="--mode synthetic --events 1 --event_only 1 --out_dim_color 1
  --H 128 --W 128 --syn_frames 120 --syn_rich 1 --C_thres 0.2
  --bound 1.0 --scale 1.0 --lr 0.005 --fovy 60
  --cuda_ray --fp16 --batch_size_evs 8192 --num_rays 8192
  --march_samples 32 --compact_frac 0.5 --max_steps 1024
  --iters 3000 --eval_interval 5 --log_every 100
  --val_idxs 10 --val_idxs 35 --val_idxs 60 --val_idxs 85 --val_idxs 110
  --outdir $OUT"

run() {
  name=$1; ckpt=$2; shift 2
  echo "=== RUN $name: $* ==="
  timeout 4200 python /root/repo/main.py $COMMON --ckpt "$ckpt" --expname "$name" "$@" \
    >> "$OUT/$name.log" 2>&1
  echo "=== $name done (rc=$?) ==="
  grep "\[eval\]" "$OUT/$name.log" | tail -2
}

cd /root/repo
run B_share     latest  --ff --share_march 1
run C_hashgrid  scratch --share_march 1
run D_noev      scratch --ff --share_march 1 --negative_event_sampling 1
echo "MATRIX DONE"
bash scripts/bench_sweep.sh 2>&1 | tee "$OUT/bench_sweep.log"
echo "ALL DONE"
