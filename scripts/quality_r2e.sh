#!/bin/bash
# Round-2e: the textured-scene arm (after r2d).
#
# quality_r2b/r2c/r2d showed the mist-mode plateau (~15-16 dB corrected) on
# the SMOOTH synthetic scene, where events only occur at blob silhouettes
# and interior/background brightness is unconstrained by event supervision.
# syn_rich=2 adds a checkered floor + high-frequency albedo texture:
# 27x the events, 2.3x the pixel coverage — emulating the reference's real
# textured esim rooms.  M_tex = the D_noev winner config on that scene.
set -u
OUT=${1:-/root/repo/output/quality_r2e}
mkdir -p "$OUT"
cd /root/repo

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
  grep "\[eval\]" "$OUT/$name.log" | tail -2
}

run M_tex 5400 --ff --share_march 1 --negative_event_sampling 1 \
  --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200
# level-shape gate on the scene where reconstruction is information-
# sufficient (smooth-scene deltas are mist-regime artifacts)
run M_tex8 5400 --ff --share_march 1 --negative_event_sampling 1 \
  --num_levels 8 --level_dim 4 --grid_block 3 \
  --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200
# opaque-at-init on the textured scene (carve dynamics)
run M_texbias 5400 --ff --share_march 1 --negative_event_sampling 1 \
  --density_bias 3.0 \
  --iters 3000 --eval_interval 10 --ckpt_interval 10 --log_every 200
echo "ALL R2E DONE"
