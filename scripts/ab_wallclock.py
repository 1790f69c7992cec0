"""Equal-wall-clock columns for the head-to-head A/B (VERDICT r4 item 3).

Both trainers leave per-epoch validation renders on disk; file mtimes give
each eval a wall-clock offset from run start (run start = the workspace's
init-time provenance file: ours writes args.json, the reference copies its
config).  This script computes plain + corrected metrics PER EVAL EPOCH
with the shared implementation (scripts/ab_metrics.compute) and emits:

  - one JSON line per (side, epoch): metrics + t_rel_s
  - a summary: equal-iters (final vs final) and equal-wall-clock — each
    side's final number vs the other side evaluated at the nearest eval
    within the same elapsed wall time.

Usage:
  python scripts/ab_wallclock.py --ref_ws <ref workspace> \
      --ours_ws <ours workspace> --scene textured_acc \
      [--out results_wallclock.jsonl]
"""

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import ab_metrics


def _epochs(files, pat):
    out = {}
    for f in files:
        m = re.search(pat, os.path.basename(f))
        if m:
            out.setdefault(int(m.group(1)), []).append(f)
    return out


def _start_time(ws, candidates):
    for c in candidates:
        hits = glob.glob(os.path.join(ws, c))
        if hits:
            return min(os.path.getmtime(h) for h in hits)
    raise FileNotFoundError(f"no start marker in {ws} ({candidates})")


def side_series(label, ws, pred_dir, pred_pat, pred_glob_fmt, gt_glob,
                start_markers):
    t0 = _start_time(ws, start_markers)
    by_ep = _epochs(glob.glob(os.path.join(ws, pred_dir, "*")), pred_pat)
    series = []
    for ep in sorted(by_ep):
        t_rel = max(os.path.getmtime(f) for f in by_ep[ep]) - t0
        m = ab_metrics.compute(
            os.path.join(ws, pred_dir, pred_glob_fmt.format(ep=ep)),
            os.path.join(ws, gt_glob))
        m.update(label=label, epoch=ep, t_rel_s=round(t_rel, 1))
        series.append(m)
    return series


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref_ws", required=True)
    ap.add_argument("--ours_ws", required=True)
    ap.add_argument("--scene", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    # reference: raw renders validation/raw/*_ep{E}_*.npy; gt pngs carry an
    # epoch tag too (any epoch's gt is identical — take the latest set)
    ref_gts = glob.glob(os.path.join(args.ref_ws, "validation/gt/*_gt.png"))
    ref_gt_ep = max(int(re.search(r"_ep(\d+)_", os.path.basename(f)).group(1))
                    for f in ref_gts)
    ref = side_series(
        f"ref_{args.scene}", args.ref_ws, "validation/raw",
        r"_ep(\d+)_", "*_ep{ep:04d}_*.npy",
        f"validation/gt/*_ep{ref_gt_ep:04d}_*_gt.png",
        ["config*.txt", "args*.txt", "log_*.txt", "log.txt"])
    ours = side_series(
        f"ours_{args.scene}", args.ours_ws, "validation/prediction",
        r"ep(\d+)_", "ep{ep:04d}_*.png", "validation/gt/*.png",
        ["args.json"])

    lines = ref + ours
    # equal-wall-clock: each side's number at the LAST eval not exceeding
    # the other side's total elapsed time (or its first eval if none)
    def at_time(series, t):
        ok = [m for m in series if m["t_rel_s"] <= t]
        return ok[-1] if ok else series[0]

    summary = {
        "label": f"summary_{args.scene}",
        "equal_iters": {"ref": ref[-1], "ours": ours[-1]},
        "equal_wallclock": {
            "t_ours_final_s": ours[-1]["t_rel_s"],
            "ref_at_ours_time": at_time(ref, ours[-1]["t_rel_s"]),
            "t_ref_final_s": ref[-1]["t_rel_s"],
            "ours_at_ref_time": at_time(ours, ref[-1]["t_rel_s"]),
        },
    }
    lines.append(summary)
    text = "\n".join(json.dumps(l) for l in lines)
    print(text)
    if args.out:
        with open(args.out, "a") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
