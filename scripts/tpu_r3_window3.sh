#!/bin/bash
# Third TPU window: equal-FIDELITY eval-render comparison.  The window-1
# run compared the alive-ray renderer (full 1024-step march) against the
# round-2 static eval at its 128-live-sample CAP — unequal outputs
# (max|diff| 0.91 on the misty R3c scene: the cap truncates).  The honest
# comparison is both renderers at the full march depth.
set -u
cd /root/repo
W2_PID=${1:?window-2 pid}
while kill -0 "$W2_PID" 2>/dev/null; do sleep 60; done
echo "window 2 done at $(date +%H:%M)"

echo "=== eval render: static FULL-DEPTH (1024 live samples) vs alive-ray ==="
timeout 2400 python scripts/bench_eval_render.py \
  --workspace output/quality_r3/testweek/R3c_warmmarch --H 128 --W 128 \
  --march_samples 512 --max_steps 1024 --chunk 4096 2>&1 | tail -4

echo "=== final bench.py confirmation ==="
timeout 2400 python bench.py 2>&1 | tail -1
echo "WINDOW 3 DONE at $(date +%H:%M)"
