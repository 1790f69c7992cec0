"""Render markdown tables from the durable eval series (cfg.eval_log).

Input: one or more results/*.jsonl files (one JSON object per eval —
trainer._eval_log schema: ts/workspace/epoch/step + eval metrics).
Emits, per file: best + final corrected PSNR/SSIM, the peak epoch, and a
compact trajectory line (every eval: epoch -> corrected PSNR) so a
collapse or a climb is visible at a glance without the workspace log.

Usage: python scripts/results_table.py results/r5/*.jsonl [--traj]
"""

import argparse
import json


def load(path):
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonls", nargs="+")
    ap.add_argument("--traj", action="store_true",
                    help="also print per-eval trajectories")
    ap.add_argument("--metric", default="psnr_corrected")
    args = ap.parse_args(argv)

    print(f"| run | best {args.metric} (ep) | final (ep) | ssim@best | evals |")
    print("|---|---|---|---|---|")
    trajs = []
    for path in args.jsonls:
        rows = [r for r in load(path) if r.get(args.metric) is not None]
        name = path.rsplit("/", 1)[-1].removesuffix(".jsonl")
        if not rows:
            print(f"| {name} | — | — | — | 0 |")
            continue
        best = max(rows, key=lambda r: r[args.metric])
        final = rows[-1]
        ssim = best.get("ssim_corrected", best.get("ssim"))
        print(f"| {name} | {best[args.metric]:.2f} (ep{best['epoch']}) "
              f"| {final[args.metric]:.2f} (ep{final['epoch']}) "
              f"| {ssim:.3f} | {len(rows)} |")
        trajs.append((name, rows))
    if args.traj:
        for name, rows in trajs:
            pts = " ".join(f"{r['epoch']}:{r[args.metric]:.2f}" for r in rows)
            print(f"\n{name}: {pts}")


if __name__ == "__main__":
    main()
