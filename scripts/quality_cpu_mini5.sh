#!/bin/bash
# Part 5: --warmup_num_steps quality A/B at CPU mini scale under the
# winning warmup schedule (C_warm recipe).  The warmup program is
# encoder-address-rate bound, so halving its fixed-step sample count
# halves warmup wall-clock; this arm pair checks the cheaper carve is
# quality-neutral before recommending it at TPU scale.
# Usage: quality_cpu_mini5.sh <arm>   with arm in {W_full, W_fast}
set -u
OUT=/root/repo/output/quality_cpu_mini
mkdir -p "$OUT"
cd /root/repo

ARM=${1:?arm name}
case "$ARM" in
  W_full) WNS="" ;;
  W_fast) WNS="--warmup_num_steps 24" ;;
  *) echo "unknown arm $ARM"; exit 2 ;;
esac

ENERF_PLATFORM=cpu ENERF_TPU_INTERPRET=1 timeout 10000 \
  python /root/repo/main.py \
  --mode synthetic --events 1 --event_only 1 --out_dim_color 1 \
  --H 64 --W 64 --syn_frames 60 --syn_rich 2 --C_thres 0.2 \
  --bound 1.0 --scale 1.0 --lr 0.005 --fovy 60 \
  --cuda_ray --fp16 --batch_size_evs 2048 --num_rays 2048 \
  --march_samples 16 --compact_frac 0.5 --max_steps 512 --num_steps 48 \
  --val_idxs 10 --val_idxs 30 --val_idxs 50 \
  --outdir $OUT --ckpt scratch --expname "$ARM" \
  --ff --share_march 1 --negative_event_sampling 1 \
  --march_warmup 200 $WNS \
  --iters 1200 --eval_interval 8 --ckpt_interval 20 --log_every 200 \
  > "$OUT/$ARM.log" 2>&1
echo "done rc=$?"
grep -a "\[eval\]" "$OUT/$ARM.log" | tail -2
