#!/bin/bash
# Everything to run, in priority order, once the TPU relay returns.
set -u
cd /root/repo
echo "=== $(date) TPU queue start ==="
echo "--- bench (new defaults: 8x4 blk3 + share_march) ---"
timeout 1800 python bench.py 2>&1 | tail -2
echo "--- bench (reference shape, for the sweep record) ---"
timeout 1800 python bench.py --num_levels 16 --level_dim 2 --grid_block 4 --share_march 0 2>&1 | tail -1
echo "--- stage breakdown (default config) ---"
timeout 1800 python scripts/perf_breakdown.py 2>&1 | tail -10
echo "--- quality queue ---"
bash scripts/resume_r2ef2.sh
echo "=== $(date) TPU queue done ==="
