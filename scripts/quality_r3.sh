#!/bin/bash
# Round-3 quality queue (VERDICT item 2: converged flagship run).
#
# Round-2 evidence (ROUND2_STATUS.md): the uniform fixed-step sampler —
# the reference's ACTUAL enerf-config path (cuda_ray=False,
# /root/reference/configs/spiral1/spiral1_enerf.txt) — breaks the mist
# gauge mode (J_fixed 17.3 dB vs 16.0 march plateau on the smooth scene),
# and the round-2 N_final log shows the march phase DEGRADING a
# 13.7 dB warmup carve back to 11.7 dB on the textured scene.  So round 3
# promotes the fixed-step path to the flagship schedule and keeps a
# long-warmup march arm as the comparison.
#
# Budgets sized from the round-3 smoke (smoke2.log): fixed-step at
# 8192 rays x 128 steps x 4 renders runs ~0.26 it/s => batch 4096 ~2s/step.
# A: 9000 iters @ ~2s = ~5h;  C: 3000 warm @ ~1s (warmup_num_steps 32)
# + 9000 march @ ~0.7s = ~2.5h.
set -u
OUT=/root/repo/output/quality_r3
mkdir -p "$OUT"
cd /root/repo

COMMON="--mode synthetic --events 1 --event_only 1 --out_dim_color 1
  --H 128 --W 128 --syn_frames 120 --syn_rich 2 --C_thres 0.2
  --bound 1.0 --scale 1.0 --lr 0.005 --fovy 60
  --fp16 --ff
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

# A: flagship — reference recipe (uniform fixed-step) to convergence.
run R3a_fixed 19800 \
  --batch_size_evs 4096 --num_rays 4096 \
  --num_steps 128 --upsample_steps 0 --negative_event_sampling 1 \
  --iters 9000 --eval_interval 5 --ckpt_interval 10 --log_every 200

# C: long-warmup march arm (the round-2 N_final design with 2.5x the
# warmup and cheap warmup sampling) — does the march hold the carve?
run R3c_warmmarch 12600 \
  --batch_size_evs 8192 --num_rays 8192 \
  --cuda_ray --march_samples 32 --compact_frac 0.5 --max_steps 1024 \
  --num_steps 128 --march_warmup 3000 --warmup_num_steps 32 \
  --negative_event_sampling 1 --share_march 1 \
  --iters 12000 --eval_interval 10 --ckpt_interval 20 --log_every 500

echo "ALL R3 QUALITY DONE"

# NOTE (round-3 record): arm A ran exactly as above; the march arm and the
# accumulation arm were executed via scripts/tpu_r3_window{,2}.sh to
# interleave benches on the single chip — see those scripts + the window
# logs for the as-run budgets.
