"""Shared metric computation for the head-to-head quality A/B.

Computes plain AND affine-corrected PSNR/SSIM from saved validation
renders with ONE implementation, so the reference's numbers and ours are
produced by the same code (each trainer's own metrics differ in detail —
comparing their printed numbers would not be apples-to-apples).

Correction math = the reference's event-only evaluation protocol
(nerf/utils.py:44-71 solve_normal_equations in log space, fit jointly over
all val views, then exp back): pred/gt are grayscale pngs in [0,255].

Usage:
  python scripts/ab_metrics.py --pred "ws/validation/prediction/ep0015_*.png" \
                               --gt   "ws/validation/gt/*.png" --label ours
Prints one JSON line: {"label":..., "psnr":..., "ssim":...,
                       "psnr_corrected":..., "ssim_corrected":..., "n":...}
"""

import argparse
import glob
import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_gray(path):
    if path.endswith(".npy"):
        # raw render in [0, 1] (the reference's validation/raw/*.npy)
        a = np.load(path).astype(np.float32)
        if a.ndim == 3:
            a = a[..., 0] if a.shape[-1] == 1 else a @ np.asarray(
                [0.299, 0.587, 0.114], np.float32)
        return np.clip(a, 0.0, 1.0)
    im = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    assert im is not None, path
    return im.astype(np.float32) / 255.0


def compute(pred_glob, gt_glob):
    """Plain + corrected metrics for one set of renders.  Returns a dict
    (shared by the CLI below and scripts/ab_wallclock.py)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from enerf_tpu.train.metrics import psnr, ssim, solve_normal_equations

    preds = sorted(glob.glob(pred_glob))
    gts = sorted(glob.glob(gt_glob))
    assert preds, f"no predictions match {pred_glob}"
    assert len(preds) == len(gts), (
        f"{len(preds)} preds vs {len(gts)} gts ({pred_glob} | {gt_glob})")

    p = np.stack([load_gray(f) for f in preds])  # [N, H, W] in [0,1]
    g = np.stack([load_gray(f) for f in gts])

    plain_psnr = float(np.mean([psnr(pi, gi, max_val=1.0)
                                for pi, gi in zip(p, g)]))
    plain_ssim = float(np.mean([ssim(pi, gi, data_range=1.0)
                                for pi, gi in zip(p, g)]))

    pl = np.log(255.0 * p + 1e-3)
    gl = np.log(255.0 * g + 1e-3)
    a, b = solve_normal_equations(pl, gl)
    pc = np.exp(pl * a + b)
    g255 = 255.0 * g
    cor_psnr = float(np.mean([psnr(pi, gi, max_val=255.0)
                              for pi, gi in zip(pc, g255)]))
    cor_ssim = float(np.mean([ssim(pi, gi, data_range=255.0)
                              for pi, gi in zip(pc, g255)]))
    return {
        "n": len(preds),
        "psnr": round(plain_psnr, 3), "ssim": round(plain_ssim, 4),
        "affine_a": round(float(a), 4), "affine_b": round(float(b), 4),
        "psnr_corrected": round(cor_psnr, 3),
        "ssim_corrected": round(cor_ssim, 4),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred", required=True, help="glob of prediction pngs")
    ap.add_argument("--gt", required=True, help="glob of gt pngs")
    ap.add_argument("--label", default="")
    args = ap.parse_args(argv)
    out = compute(args.pred, args.gt)
    out["label"] = args.label
    print(json.dumps(out))


if __name__ == "__main__":
    main()
