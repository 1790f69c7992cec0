"""Convert workspace raw .npy renders to pngs (+ contrast-spread variants).

Parity: reference scripts/raw_to_png.py — walks a `raw`/`*_raw.npy` dir,
writes clipped 8-bit pngs plus min-max contrast-spread versions (useful for
event-only runs where absolute intensity carries an arbitrary affine gauge).

Works on the dirs this framework writes: `validation/event_view/*_raw.npy`
and `results/*_raw.npy` (trainer.py / Trainer.test).
"""

import argparse
import glob
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser(description="raw npy renders -> pngs")
    ap.add_argument("--indir", required=True,
                    help="dir containing *.npy raw renders")
    ap.add_argument("--start_from", type=int, default=0)
    args = ap.parse_args()

    import cv2

    outdir = os.path.join(os.path.dirname(args.indir.rstrip("/")), "raw_pngs")
    outdirc = os.path.join(outdir, "contrast_spread")
    os.makedirs(outdirc, exist_ok=True)

    files = sorted(glob.glob(os.path.join(args.indir, "*.npy")))[args.start_from:]
    if not files:
        raise SystemExit(f"no .npy files in {args.indir}")
    for path in files:
        name = os.path.splitext(os.path.basename(path))[0]
        raw = np.load(path)
        if raw.ndim == 3 and raw.shape[-1] == 1:
            raw = raw[..., 0]
        img8 = np.rint(np.clip(raw * 255.0, 0, 255)).astype(np.uint8)
        if img8.ndim == 3 and img8.shape[-1] == 3:
            img8 = cv2.cvtColor(img8, cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(outdir, name + ".png"), img8)
        lo, hi = float(raw.min()), float(raw.max())
        spread = np.rint(
            (raw - lo) / max(hi - lo, 1e-12) * 255.0).astype(np.uint8)
        if spread.ndim == 3 and spread.shape[-1] == 3:
            spread = cv2.cvtColor(spread, cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(outdirc, name + "_spread.png"), spread)
    print(f"wrote {len(files)} pngs to {outdir}")


if __name__ == "__main__":
    main()
