"""Evaluation metrics: PSNR, SSIM, affine log-intensity correction, LPIPS gate.

Parity:
  - nerf/utils.py:252-287 PSNRMeter (max value 1.0)
  - nerf/utils.py:44-71 solve_normal_equations — least-squares affine (a, b)
    mapping predicted log intensity to GT log intensity over all val images
    (event-only training is supervised only up to an affine log transform)
  - nerf/utils.py:73-92 LPIPS/compute_pnsr helpers; skimage SSIM

LPIPS needs pretrained AlexNet/VGG weights (the `lpips` package) which are
not available in this image; `lpips_available()` gates it and evaluation
reports None — documented divergence, not a silent drop.
"""

import numpy as np
from scipy.ndimage import uniform_filter


def psnr(pred, gt, max_val=1.0):
    """Mean PSNR over the whole array (reference PSNRMeter.update)."""
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    mse = np.mean((pred - gt) ** 2)
    if mse == 0:
        return np.inf
    return -10.0 * np.log10(mse) + 20.0 * np.log10(max_val)


def ssim(img0, img1, data_range=1.0, win_size=7, channel_axis=-1):
    """Structural similarity, matching skimage.metrics.structural_similarity
    defaults (uniform 7x7 window, K1=0.01, K2=0.03, sample covariance).

    img0, img1: [H, W] or [H, W, C] float arrays.
    """
    img0 = np.asarray(img0, np.float64)
    img1 = np.asarray(img1, np.float64)
    if img0.ndim == 3:
        vals = [
            ssim(img0[..., c], img1[..., c], data_range, win_size, None)
            for c in range(img0.shape[-1])
        ]
        return float(np.mean(vals))

    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size ** 2
    cov_norm = NP / (NP - 1)  # sample covariance, skimage default

    filt = lambda x: uniform_filter(x, size=win_size)
    ux, uy = filt(img0), filt(img1)
    uxx, uyy, uxy = filt(img0 * img0), filt(img1 * img1), filt(img0 * img1)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    pad = (win_size - 1) // 2
    return float(S[pad:-pad, pad:-pad].mean())


def solve_normal_equations(preds_log, gts_log):
    """Least-squares affine fit gt_log ~= a * pred_log + b.

    preds_log, gts_log: arrays of identical shape (all val images stacked).
    Returns (a, b) with the reference's nan fallbacks (utils.py:61-69).
    """
    x = np.asarray(preds_log, np.float64).reshape(-1)
    y = np.asarray(gts_log, np.float64).reshape(-1)
    X = np.stack([np.ones_like(x), x], axis=1)
    try:
        beta = np.linalg.inv(X.T @ X) @ (X.T @ y)
        b, a = beta[0], beta[1]
    except np.linalg.LinAlgError:
        a, b = np.nan, np.nan
    if np.isnan(b):
        b = 5.0
    if np.isnan(a):
        a = 5.0
    return float(a), float(b)


def lpips_available():
    try:
        import lpips  # noqa: F401
        return True
    except ImportError:
        return False


def compute_lpips(pred, gt, rgb_channels=3):
    """LPIPS alex+vgg (reference utils.py:40-41, 1096-1112).

    Uses the torch lpips package when importable; otherwise the built-in
    JAX implementation (train/lpips_jax.py) with fixed seeded random
    features — values then carry the `_rand` label via lpips_label() and
    are run-to-run comparable but not comparable to torch-lpips numbers.
    """
    if lpips_available():
        import torch
        import lpips as lpips_mod

        fn_alex = lpips_mod.LPIPS(net="alex")
        fn_vgg = lpips_mod.LPIPS(net="vgg")
        def prep(x):
            t = torch.from_numpy(np.asarray(x, np.float32))[None].permute(0, 3, 1, 2)
            t = 2.0 * t - 1.0
            if rgb_channels == 1:
                t = t.expand(1, 3, *t.shape[2:])
            return t
        with torch.no_grad():
            a = float(fn_alex(prep(gt), prep(pred)))
            v = float(fn_vgg(prep(gt), prep(pred)))
        return a, v
    from enerf_tpu.train.lpips_jax import lpips_distance
    return (lpips_distance(pred, gt, "alex"), lpips_distance(pred, gt, "vgg"))


def lpips_label():
    """Suffix for eval-log keys: '' for torch/calibrated, '_rand' for the
    seeded-random-feature fallback."""
    if lpips_available():
        return ""
    from enerf_tpu.train.lpips_jax import lpips_is_calibrated
    return "" if lpips_is_calibrated() else "_rand"


class PSNRMeter:
    """Running-mean PSNR (reference utils.py:252-287)."""

    def __init__(self):
        self.V = 0.0
        self.N = 0

    def clear(self):
        self.V, self.N = 0.0, 0

    def update(self, preds, truths):
        self.V += psnr(preds, truths)
        self.N += 1

    def measure(self):
        return self.V / max(self.N, 1)

    def report(self):
        return f"PSNR = {self.measure():.6f}"
