"""Summarize a training-run log: eval series + mist telemetry in one table.

Quality runs carry their own diagnosis (ws_mean per train line, [occ]
occupied fraction per eval — BENCH_NOTES round 3/4); this collates them so
a run's trajectory (and a march arm's gauge-mode health) is one command:

  python scripts/summarize_run.py output/quality_r4/R4a_marchacc.log

Prints one row per eval epoch: step, corrected PSNR/SSIM, plain PSNR,
occupied fraction, mean density, and the nearest preceding train line's
ws_mean + it/s.  Pure log parsing — no jax.
"""

import argparse
import re
import sys


TRAIN = re.compile(
    r"\[train\] epoch (\d+) step (\d+) loss=([\d.eE+-]+).*?"
    r"(?:ws_mean=([\d.eE+-]+))?\s.*?\(([\d.]+) it/s\)")
EVAL = re.compile(r"\[eval\] epoch (\d+): (.*)")
OCC = re.compile(
    r"\[occ\] occupied fraction ([\d.eE+-]+)(?:.*?mean[_ ]density ([\d.eE+-]+))?")
KV = re.compile(r"(\w+)=([\d.eE+nan-]+)")


def parse(path):
    rows, last_train, last_occ = [], None, None
    with open(path, errors="replace") as f:
        for line in f:
            m = TRAIN.search(line)
            if m:
                last_train = {
                    "epoch": int(m.group(1)), "step": int(m.group(2)),
                    "loss": float(m.group(3)),
                    "ws_mean": float(m.group(4)) if m.group(4) else None,
                    "it_s": float(m.group(5)),
                }
                continue
            m = OCC.search(line)
            if m:
                last_occ = {
                    "occ_frac": float(m.group(1)),
                    "mean_density": float(m.group(2)) if m.group(2) else None,
                }
                continue
            m = EVAL.search(line)
            if m:
                kv = dict(KV.findall(m.group(2)))
                rows.append({
                    "epoch": int(m.group(1)),
                    "step": last_train["step"] if last_train else None,
                    "psnr_c": float(kv.get("psnr_corrected", "nan")),
                    "ssim_c": float(kv.get("ssim_corrected", "nan")),
                    "psnr": float(kv.get("psnr", "nan")),
                    "ws_mean": last_train.get("ws_mean") if last_train else None,
                    "it_s": last_train.get("it_s") if last_train else None,
                    "occ_frac": last_occ["occ_frac"] if last_occ else None,
                    "mean_density": last_occ.get("mean_density") if last_occ else None,
                })
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--every", type=int, default=1,
                    help="print every Nth eval row (last row always)")
    args = ap.parse_args(argv)
    rows = parse(args.log)
    if not rows:
        print("no [eval] lines found", file=sys.stderr)
        return 1
    fmt = ("{epoch:>5} {step!s:>7} {psnr_c:>7.2f} {ssim_c:>6.3f} "
           "{psnr:>7.2f} {ws:>7} {occ:>7} {its:>6}")
    print(f"{'epoch':>5} {'step':>7} {'psnr_c':>7} {'ssim_c':>6} "
          f"{'psnr':>7} {'ws_mean':>7} {'occ%':>7} {'it/s':>6}")
    for i, r in enumerate(rows):
        if i % args.every and i != len(rows) - 1:
            continue
        print(fmt.format(
            epoch=r["epoch"], step=r["step"], psnr_c=r["psnr_c"],
            ssim_c=r["ssim_c"], psnr=r["psnr"],
            ws=f"{r['ws_mean']:.3f}" if r["ws_mean"] is not None else "-",
            occ=f"{r['occ_frac']:.4f}" if r["occ_frac"] is not None else "-",
            its=f"{r['it_s']:.2f}" if r["it_s"] is not None else "-"))
    best = max(rows, key=lambda r: r["psnr_c"])
    print(f"best: epoch {best['epoch']} psnr_c={best['psnr_c']:.2f} "
          f"ssim_c={best['ssim_c']:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
