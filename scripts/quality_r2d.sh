#!/bin/bash
# Round-2d TPU session (after quality_r2c's C_hashgrid finishes).
#
# Diagnosis (see ROUND2_STATUS.md): the 16-dB plateau is the transparent
# "mist" gauge mode of short-baseline event pairs — with a shared random
# background, Delta log = log((1-w2)/(1-w1)) lets per-view OPACITY wiggles
# of a thin mist fit every consecutive-event pair (measured on the D_noev
# checkpoint: corr(Delta, pol*C) = 0.995 at weights_sum ~= 0.1).  The
# in-reference remedies under test here:
#   H_acc  - event ACCUMULATION (provider.py:1367-1405): random successor
#            windows create long-baseline pairs that the mist cannot fit.
#            share_march off (accumulated pairs are not tightly correlated).
#   I_norm - the normalized loss (C_thres=-1), the actual spiral1_enerf
#            setting (utils.py:517-528).
#   G_l8c4 - the 8-levels x 4-feats x blk3 gather-count ablation (perf
#            default gate; quality must hold).
# Plus the round-2b bench sweep of the new variants (bf16 row gathers).
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

run H_acc 5400 --ff --negative_event_sampling 1 \
  --accumulate_evs 1 --acc_max_num_evs 32 \
  --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200
run I_norm 5400 --ff --share_march 1 --negative_event_sampling 1 \
  --C_thres -1 \
  --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200
run G_l8c4 5400 --ff --share_march 1 --negative_event_sampling 1 \
  --num_levels 8 --level_dim 4 --grid_block 3 \
  --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200
# K_opac: beyond-reference opacity binary-entropy regularizer (config
# w_opacity) — the direct counter to the mist mode
run K_opac 5400 --ff --share_march 1 --negative_event_sampling 1 \
  --w_opacity 0.01 \
  --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200
# L_bias: opaque-at-init density-logit bias (sigma0 ~ e^3) — the march
# starts opaque and CARVES, matching the reference run()'s effective init
run L_bias 5400 --ff --share_march 1 --negative_event_sampling 1 \
  --density_bias 3.0 \
  --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200
# J_fixed: the reference's ACTUAL enerf-config path — cuda_ray OFF, uniform
# fixed-step sampling (num_steps, renderer.py run()) — no occupancy
# reinforcement of the mist.  --cuda_ray is absent from COMMON here only
# because run() appends flags after it; strip it via a second COMMON.
echo "=== RUN J_fixed ==="
timeout 5400 python /root/repo/main.py --mode synthetic --events 1 \
  --event_only 1 --out_dim_color 1 --H 128 --W 128 --syn_frames 120 \
  --syn_rich 1 --C_thres 0.2 --bound 1.0 --scale 1.0 --lr 0.005 --fovy 60 \
  --fp16 --batch_size_evs 4096 --num_rays 4096 \
  --num_steps 128 --upsample_steps 0 \
  --val_idxs 10 --val_idxs 35 --val_idxs 60 --val_idxs 85 --val_idxs 110 \
  --outdir $OUT --ckpt scratch --expname J_fixed --ff \
  --negative_event_sampling 1 \
  --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200 \
  > "$OUT/J_fixed.log" 2>&1
echo "=== J_fixed done (rc=$?) ==="
grep "\[eval\]" "$OUT/J_fixed.log" | tail -2
echo "ALL R2D DONE"
