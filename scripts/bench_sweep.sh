#!/bin/bash
# Post-change performance sweep on the real TPU (run when the chip is free).
set -u
cd /root/repo
echo "=== default (blk4, no share, 8192 rays) ==="
timeout 1200 python bench.py
echo "=== share_march ==="
timeout 1200 python bench.py --share_march 1
echo "=== grid_block 3 ==="
timeout 1200 python bench.py --grid_block 3
echo "=== 16384 rays ==="
timeout 1200 python bench.py --n_rays 16384
echo "=== share + blk3 + 16384 ==="
timeout 1200 python bench.py --share_march 1 --grid_block 3 --n_rays 16384
echo "=== scatter microbench ==="
timeout 1800 python scripts/bench_scatter.py
echo "SWEEP DONE"
