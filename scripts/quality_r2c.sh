#!/bin/bash
# Round-2c quality runs on the synthetic esim scene (TPU, sequential).
#
# Builds on the r2b matrix results (output/quality_r2b):
#   A_base 14.9 / B_share 15.1 / D_noev (share+noev) 16.0 corrected PSNR,
#   affine_a ~= 1.07 with the no-event loss.
# This round:
#   F_blk3     - D_noev config with grid_block=3 (512B rows): does the
#                faster encoder geometry hold quality?  (gates the bench
#                default flip to share+blk3)
#   C_hashgrid - the hashgrid-vs-blockgrid encoder ablation, rerun now that
#                eval renders are chunked (r2b run OOMed HBM)
#   E_long     - the D_noev winner at 30k iters with the fused train loop
#                (the lr schedule decays to 0.1*lr0 at --iters)
#
# Usage: bash scripts/quality_r2c.sh [outdir]
set -u
OUT=${1:-/root/repo/output/quality_r2c}
mkdir -p "$OUT"

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

cd /root/repo
run F_blk3     4200 --ff --share_march 1 --negative_event_sampling 1 \
  --grid_block 3 --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200
run C_hashgrid 7200 --share_march 1 --negative_event_sampling 1 \
  --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200
run E_long    12000 --ff --share_march 1 --negative_event_sampling 1 \
  --iters 30000 --eval_interval 30 --ckpt_interval 30 --log_every 1000
echo "ALL RUNS DONE"
