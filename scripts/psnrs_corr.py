"""Offline affine-corrected PSNR from saved raw renders vs GT images.

Parity: reference scripts/psnrs_corr.py — recomputes the event-only (a, b)
log-correction metrics from workspace artifacts without re-rendering.

Usage: python scripts/psnrs_corr.py --pred_dir ws/validation/raw --gt_dir gts/
"""

import argparse
import glob
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred_dir", required=True, help="dir of *_raw.npy or *.npy preds")
    ap.add_argument("--gt_dir", required=True, help="dir of gt pngs")
    args = ap.parse_args(argv)

    from enerf_tpu.train.metrics import psnr, ssim, solve_normal_equations

    preds = sorted(glob.glob(os.path.join(args.pred_dir, "*.npy")))
    gts = sorted(glob.glob(os.path.join(args.gt_dir, "*.png")))
    assert preds and len(preds) == len(gts), (len(preds), len(gts))

    p_list, g_list = [], []
    for pp, gp in zip(preds, gts):
        p = np.load(pp)
        g = cv2.imread(gp, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
        if p.ndim == 3 and p.shape[-1] == 3:
            p = p @ np.asarray([0.299, 0.587, 0.114], np.float32)
        p_list.append(np.log(255.0 * p.reshape(g.shape) + 1e-3))
        g_list.append(np.log(255.0 * g + 1e-3))

    a, b = solve_normal_equations(np.stack(p_list), np.stack(g_list))
    print(f"affine correction: a={a:.4f} b={b:.4f}")
    psnrs, ssims = [], []
    for pl, gl in zip(p_list, g_list):
        pc = np.exp(pl * a + b)
        gt255 = np.exp(gl)
        psnrs.append(psnr(pc, gt255, max_val=255.0))
        ssims.append(ssim(pc, gt255, data_range=255.0))
    print(f"psnr-corrected mean = {np.mean(psnrs):.4f}")
    print(f"ssim-corrected mean = {np.mean(ssims):.4f}")


if __name__ == "__main__":
    main()
