#!/bin/bash
# Perf-smoke regression gate (VERDICT r4 weak 2: a bench hang was first
# detected by the driver, after the round was over).  Run this BEFORE a
# round snapshot / before shipping changes that touch the hot path:
#
#   bash scripts/perf_smoke.sh            # TPU, full-size, ~1 min warm
#   ENERF_PLATFORM=cpu bash scripts/perf_smoke.sh   # CPU-sized smoke
#
# Exit 1 if bench.py emits a diagnostic (value 0.0) line or no line at
# all — i.e. exactly the failure mode that produced BENCH_r04's null.
set -u
cd "$(dirname "$0")/.."
ARGS=()
if [ "${ENERF_PLATFORM:-}" = cpu ]; then
  ARGS=(--n_rays 128 --num_samples 8)   # CPU-compilable march shape
fi
LINE=$(ENERF_BENCH_BUDGET=${ENERF_BENCH_BUDGET:-1800} \
       python bench.py "${ARGS[@]}" 2>/dev/null | tail -1)
echo "$LINE"
python - "$LINE" <<'EOF'
import json, sys
try:
    d = json.loads(sys.argv[1])
except Exception:
    print("perf_smoke: NO PARSEABLE OUTPUT", file=sys.stderr); sys.exit(1)
if d.get("value", 0) <= 0 or "error" in d:
    print(f"perf_smoke: DIAGNOSTIC LINE ({d.get('error')})", file=sys.stderr)
    sys.exit(1)
print(f"perf_smoke: ok ({d['value']:.0f} {d['unit']}, "
      f"{d['vs_baseline']:.3f}x baseline)")
EOF
