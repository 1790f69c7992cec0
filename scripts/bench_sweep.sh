#!/bin/bash
# Post-change performance sweep on the real TPU (run when the chip is free).
# Variant set current as of the round-2 continuation: bench.py defaults are
# the quality-gated 1.44x configuration (8x4 blk3 + share_march); the
# reference encoder shape is reported alongside (BENCH_NOTES.md history).
set -u
cd /root/repo
echo "=== bench DEFAULT (8x4 blk3 + share_march — the 1.44x config) ==="
timeout 1200 python bench.py
echo "=== reference shape (16x2 blk4, no share) ==="
timeout 1200 python bench.py --num_levels 16 --level_dim 2 --grid_block 4 --share_march 0
echo "=== 8x4 blk3 without share_march ==="
timeout 1200 python bench.py --share_march 0
echo "=== 16x2 blk4 + share_march ==="
timeout 1200 python bench.py --num_levels 16 --level_dim 2 --grid_block 4
echo "=== bf16 row gathers (expected slower; regression canary) ==="
timeout 1200 python bench.py --bf16_gather 1
echo "=== 16384 rays ==="
timeout 1200 python bench.py --n_rays 16384
echo "=== stage breakdown (default config) ==="
timeout 1800 python scripts/perf_breakdown.py
echo "=== scatter microbench ==="
timeout 1800 python scripts/bench_scatter.py
echo "SWEEP DONE"
