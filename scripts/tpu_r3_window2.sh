#!/bin/bash
# Second TPU window: integrated encoder-backward bench (repaired) + the
# accumulation bonus quality arm.  Waits for the first window to exit.
set -u
cd /root/repo
OUT=output/quality_r3
W1_PID=${1:?first-window pid}

while kill -0 "$W1_PID" 2>/dev/null; do sleep 60; done
echo "window 1 done at $(date +%H:%M)"

echo "=== integrated encoder-backward bench (scatter vs segsum) ==="
timeout 2400 python - <<'EOF' 2>&1 | tail -4
import sys; sys.path.insert(0, "scripts")
import bench_scatter
bench_scatter.bench_encoder_backward()
EOF

echo "=== R3b_fixedacc: flagship schedule + event accumulation ==="
timeout 10200 python /root/repo/main.py \
  --mode synthetic --events 1 --event_only 1 --out_dim_color 1 \
  --H 128 --W 128 --syn_frames 120 --syn_rich 2 --C_thres 0.2 \
  --bound 1.0 --scale 1.0 --lr 0.005 --fovy 60 --fp16 --ff \
  --val_idxs 10 --val_idxs 35 --val_idxs 60 --val_idxs 85 --val_idxs 110 \
  --outdir $OUT --ckpt scratch --expname R3b_fixedacc \
  --batch_size_evs 4096 --num_rays 4096 \
  --num_steps 128 --upsample_steps 0 --negative_event_sampling 1 \
  --accumulate_evs 1 --acc_max_num_evs 8 \
  --iters 6000 --eval_interval 5 --ckpt_interval 10 --log_every 200 \
  > "$OUT/R3b_fixedacc.log" 2>&1
echo "R3b rc=$?"
grep -a "eval\]" "$OUT/R3b_fixedacc.log" | tail -2
echo "WINDOW 2 DONE at $(date +%H:%M)"
