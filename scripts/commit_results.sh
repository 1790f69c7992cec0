#!/bin/bash
# Eval-series durability (VERDICT r4 weak 5): two machine resets wiped
# untracked output/ twice in round 4, losing completed eval series.
# Trainers now append eval JSON lines to git-tracked files under
# results/ (cfg.eval_log); this watcher commits them at eval cadence so
# a reset costs at most one eval interval.
#
# Usage: scripts/commit_results.sh [interval_s] [max_hours]
# Run it in the background alongside a TPU run; it exits on its own
# deadline or when results/ stops changing for 3 intervals is NOT an
# exit condition (runs may legitimately go quiet during long compiles).
set -u
cd /root/repo
INTERVAL=${1:-600}
MAX_H=${2:-11}
END=$(($(date +%s) + MAX_H * 3600))
mkdir -p results
while [ "$(date +%s)" -lt "$END" ]; do
  sleep "$INTERVAL"
  if ! git diff --quiet -- results/ 2>/dev/null \
      || [ -n "$(git ls-files --others --exclude-standard results/)" ]; then
    git add results/ && git commit -q -m \
      "results: eval-series checkpoint ($(date +%H:%M))" -- results/ \
      && echo "[commit_results] committed at $(date +%H:%M:%S)"
  fi
done
echo "[commit_results] deadline reached, exiting"
