#!/bin/bash
# Post-change performance sweep on the real TPU (run when the chip is free).
# Variant set current as of round 2d (BENCH_NOTES.md has the history).
set -u
cd /root/repo
echo "=== default (16x2 blk4, f32 rows, 8192 rays) ==="
timeout 1200 python bench.py
echo "=== 8x4 blk3 (half the gathers at equal budget) ==="
timeout 1200 python bench.py --num_levels 8 --level_dim 4 --grid_block 3
echo "=== 8x4 blk3 + share_march ==="
timeout 1200 python bench.py --num_levels 8 --level_dim 4 --grid_block 3 --share_march 1
echo "=== share_march alone ==="
timeout 1200 python bench.py --share_march 1
echo "=== bf16 row gathers (expected slower; regression canary) ==="
timeout 1200 python bench.py --bf16_gather 1
echo "=== 16384 rays ==="
timeout 1200 python bench.py --n_rays 16384 --num_levels 8 --level_dim 4 --grid_block 3 --share_march 1
echo "=== scatter microbench ==="
timeout 1800 python scripts/bench_scatter.py
echo "SWEEP DONE"
