#!/bin/bash
# Post-R3a TPU window: ours-side A/B runs, perf benches, then R3c.
# Waits for the R3a process to exit first (only ONE process may own the
# TPU — verify-skill learning).  Usage: nohup bash scripts/tpu_r3_window.sh &
set -u
cd /root/repo
OUT=output/quality_r3
R3A_PID=${1:-12145}

echo "waiting for R3a (pid $R3A_PID) ..."
while kill -0 "$R3A_PID" 2>/dev/null; do sleep 60; done
echo "R3a done at $(date +%H:%M). Final evals:"
grep -a "eval\]" $OUT/R3a_fixed.log | tail -2

echo "=== ours A/B: smooth ==="
bash scripts/ab_run.sh smooth ours
grep -a "eval\]" output/ab_r3/ours_smooth.log | tail -1
echo "=== ours A/B: textured ==="
bash scripts/ab_run.sh textured ours
grep -a "eval\]" output/ab_r3/ours_textured.log | tail -1

echo "=== bench: defaults (round-3 regression check) ==="
timeout 2400 python bench.py 2>&1 | tail -1
echo "=== bench: defaults + segsum backward ==="
timeout 2400 python bench.py --segsum_grad 1 2>&1 | tail -1
echo "=== bench: reference shape ==="
timeout 2400 python bench.py --num_levels 16 --level_dim 2 --grid_block 4 --share_march 0 2>&1 | tail -1
echo "=== bench: reference shape + segsum ==="
timeout 2400 python bench.py --num_levels 16 --level_dim 2 --grid_block 4 --share_march 0 --segsum_grad 1 2>&1 | tail -1
echo "=== scatter microbench ==="
timeout 2400 python scripts/bench_scatter.py 2>&1 | tail -16

echo "=== R3c_warmmarch (reduced budget) ==="
timeout 9000 python /root/repo/main.py \
  --mode synthetic --events 1 --event_only 1 --out_dim_color 1 \
  --H 128 --W 128 --syn_frames 120 --syn_rich 2 --C_thres 0.2 \
  --bound 1.0 --scale 1.0 --lr 0.005 --fovy 60 --fp16 --ff \
  --val_idxs 10 --val_idxs 35 --val_idxs 60 --val_idxs 85 --val_idxs 110 \
  --outdir $OUT --ckpt scratch --expname R3c_warmmarch \
  --batch_size_evs 8192 --num_rays 8192 \
  --cuda_ray --march_samples 32 --compact_frac 0.5 --max_steps 1024 \
  --num_steps 128 --march_warmup 3000 --warmup_num_steps 32 \
  --negative_event_sampling 1 --share_march 1 \
  --iters 10000 --eval_interval 10 --ckpt_interval 20 --log_every 500 \
  > "$OUT/R3c_warmmarch.log" 2>&1
echo "R3c rc=$?"
grep -a "eval\]" "$OUT/R3c_warmmarch.log" | tail -2

echo "=== alive-ray eval renderer bench (on the R3c march workspace) ==="
timeout 2400 python scripts/bench_eval_render.py \
  --workspace "$OUT/testweek/R3c_warmmarch" --H 128 --W 128 \
  --march_samples 32 --max_steps 1024 --chunk 4096 2>&1 | tail -4

echo "ALL TPU WINDOW DONE at $(date +%H:%M)"
