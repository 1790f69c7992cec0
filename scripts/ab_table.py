"""Render the head-to-head A/B summary table from per-epoch metric series.

Input: the JSONL written by scripts/ab_wallclock.py (one line per
(side, epoch) plus a summary line per scene).  Epoch numbering differs
between the two trainers (the reference's epoch = one pass over the train
loader, ours = provider.steps_per_epoch), so equal-ITERS comparisons
convert epochs to iterations via --ref_spe / --ours_spe.

Emits a markdown table with three comparison columns per scene:

  - final vs final     (each side's last eval — true equal-iters when both
                        sides completed their configured budget)
  - common iters       (equal-iters even when one side was truncated by
                        wall clock — each side's last eval at or below
                        min(final iters of both sides); eval cadences
                        differ between the sides, so the two cells can sit
                        at slightly different iteration counts — each
                        cell prints its actual itN so the mismatch is
                        visible)
  - equal wall-clock   (each side at the other's total elapsed time; from
                        the ab_wallclock summary line)

Usage:
  python scripts/ab_table.py output/ab_r4/results_wallclock.jsonl \
      --ref_spe 15 --ours_spe 100
"""

import argparse
import json
from collections import defaultdict


def fmt(m, spe=None):
    it = f"it{m['epoch'] * spe}" if spe else f"ep{m['epoch']}"
    return (f"{m['psnr_corrected']:.2f} / {m['ssim_corrected']:.3f} "
            f"({it}, {m['t_rel_s']/60:.0f}m)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl")
    ap.add_argument("--ref_spe", type=int, default=15,
                    help="reference iters per epoch (= #train frames: one "
                         "loader pass per epoch)")
    ap.add_argument("--ours_spe", type=int, default=100,
                    help="ours iters per epoch (provider.steps_per_epoch)")
    args = ap.parse_args()

    series = defaultdict(dict)   # (scene, side) -> {iters: metrics}
    summaries = {}
    spe = {"ref": args.ref_spe, "ours": args.ours_spe}
    with open(args.jsonl) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            m = json.loads(line)
            label = m.get("label", "")
            if label.startswith("summary_"):
                summaries[label[len("summary_"):]] = m
                continue
            side, _, scene = label.partition("_")
            series[(scene, side)][m["epoch"] * spe.get(side, 1)] = m

    scenes = sorted({s for (s, _) in series})
    print("| scene | side | final (corr PSNR/SSIM) | at common iters | "
          "at other side's wall clock |")
    print("|---|---|---|---|---|")
    for sc in scenes:
        ref = series.get((sc, "ref"), {})
        ours = series.get((sc, "ours"), {})
        if not ref or not ours:
            print(f"| {sc} | — | (one side missing) | | |")
            continue
        target = min(max(ref), max(ours))
        # Last eval <= target per side; if a side's earliest eval is
        # already past the target (mismatched eval cadences), degrade to
        # its earliest eval rather than crashing the whole table.
        at = {}
        for side, s in (("ref", ref), ("ours", ours)):
            cand = [i for i in s if i <= target]
            at[side] = s[max(cand)] if cand else s[min(s)]
        summ = summaries.get(sc, {})
        eq = summ.get("equal_wallclock", {})
        for side, s in (("ref", ref), ("ours", ours)):
            last = s[max(s)]
            other = (eq.get("ref_at_ours_time") if side == "ref"
                     else eq.get("ours_at_ref_time"))
            print(f"| {sc} | {side} | {fmt(last, spe[side])} | "
                  f"{fmt(at[side], spe[side])} | "
                  f"{fmt(other, spe[side]) if other else '—'} |")


if __name__ == "__main__":
    main()
