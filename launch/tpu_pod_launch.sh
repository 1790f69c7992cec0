#!/usr/bin/env bash
# TPU pod-slice training launch — the role of the reference's run-single.sh
# + slurm_start_train.sbatch (code snapshot into a timestamped job dir, then
# submit), re-targeted at Cloud TPU pod slices.
#
# Usage:
#   ./launch/tpu_pod_launch.sh --tpu my-v5e-16 --zone us-central2-b \
#       --config configs/spiral1_enerf.txt [-- extra main.py args]
#
# Each worker runs the same command; jax.distributed auto-initializes from
# the TPU environment and enerf_tpu shards ray batches over the global mesh
# (--mesh_shape uses all visible devices by default).
set -euo pipefail

TPU=""
ZONE=""
CONFIG=""
JOBROOT="${JOBROOT:-$HOME/enerf_tpu_jobs}"
EXTRA=()

while [[ $# -gt 0 ]]; do
  case "$1" in
    --tpu) TPU="$2"; shift 2 ;;
    --zone) ZONE="$2"; shift 2 ;;
    --config) CONFIG="$2"; shift 2 ;;
    --) shift; EXTRA=("$@"); break ;;
    *) echo "unknown arg $1"; exit 1 ;;
  esac
done

[[ -n "$TPU" && -n "$ZONE" && -n "$CONFIG" ]] || {
  echo "usage: $0 --tpu NAME --zone ZONE --config CFG [-- extra args]"; exit 1; }

# 1) snapshot the code into a timestamped job dir (reference run-single.sh:
#    reproducibility = the snapshot IS the provenance record)
STAMP="$(date +%Y%m%d_%H%M%S)"
JOBDIR="$JOBROOT/$STAMP"
mkdir -p "$JOBDIR"
rsync -a --exclude '.git' --exclude '__pycache__' --exclude 'output' \
  "$(dirname "$0")/.." "$JOBDIR/code/"
cp "$CONFIG" "$JOBDIR/config.txt"
echo "snapshot at $JOBDIR"

# 2) ship + run on every pod worker
gcloud compute tpus tpu-vm scp --recurse "$JOBDIR/code" "$TPU":~/enerf_tpu_job \
  --zone "$ZONE" --worker=all
gcloud compute tpus tpu-vm ssh "$TPU" --zone "$ZONE" --worker=all --command "
  cd ~/enerf_tpu_job &&
  python main.py --config config.txt --outdir ~/enerf_tpu_out ${EXTRA[*]:-}
"
