"""Data-limited ceiling of event-only reconstruction on the synthetic scene.

An oracle that KNOWS ground-truth frame 0 and integrates the simulated
event stream exactly (each event adds pol*C in linlog space at its pixel)
reconstructs every later frame as well as the event data permits.  Its
corrected PSNR bounds what ANY event-only model (including the NeRF) can
achieve from this stream: remaining error is threshold quantization, event
coverage (pixels that never fire carry frame-0 brightness forever), and
the affine gauge.

Usage: python scripts/event_oracle_ceiling.py [--H 128 --W 128 \
    --n_frames 120 --C 0.2 --rich 1]

Prints per-val-frame and mean corrected PSNR/SSIM with the same affine
(a, b) correction the trainer uses (train/metrics.py), so numbers are
directly comparable to the quality-run eval lines.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pure-CPU analysis: force the CPU backend (default) so the oracle never
# contends for the chip with a training run.  The axon TPU plugin ignores
# JAX_PLATFORMS, so this must be an in-process config update before first
# device use; override with ENERF_PLATFORM if ever needed.
import jax  # noqa: E402
jax.config.update("jax_platforms", os.environ.get("ENERF_PLATFORM", "cpu"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--H", type=int, default=128)
    ap.add_argument("--W", type=int, default=128)
    ap.add_argument("--n_frames", type=int, default=120)
    ap.add_argument("--C", type=float, default=0.2)
    ap.add_argument("--rich", type=int, default=1)
    ap.add_argument("--val_idxs", type=int, nargs="*",
                    default=[10, 35, 60, 85, 110])
    ap.add_argument("--init", choices=["gt", "flat"], default="gt",
                    help="gt: oracle knows frame 0 (upper bound for "
                         "events+frame methods); flat: pure event-only "
                         "information (frame 0 unknown -> uniform)")
    args = ap.parse_args()

    from enerf_tpu.data import synthetic
    from enerf_tpu.train import metrics as M

    d = synthetic.simulate_events(H=args.H, W=args.W, C=args.C,
                                  n_frames=args.n_frames, rich=args.rich)
    ev = d["events"]  # [M, 4] x, y, t, pol
    frames = d["frames"][..., 0]  # [F, H, W] intensity in [0, 1]
    ts = d["frame_ts"]

    def linlog(img01):
        x = img01 * 255.0
        thres = 20.0
        return np.where(x < thres, np.log(thres) / thres * x,
                        np.log(np.maximum(x, 1e-20)))

    # integrate events: state = init + C * sum(pol) per pixel
    if args.init == "gt":
        state = linlog(frames[0]).astype(np.float64)
    else:
        state = np.full_like(frames[0], float(np.mean(linlog(frames[0]))),
                             dtype=np.float64)
    order = np.argsort(ev[:, 2], kind="stable")
    ev = ev[order]
    xs = ev[:, 0].astype(np.int64)
    ys = ev[:, 1].astype(np.int64)
    pols = ev[:, 3]
    tev = ev[:, 2]

    results = []
    ptr = 0
    recons, gts = [], []
    for fi in sorted(args.val_idxs):
        t = ts[fi]
        while ptr < len(tev) and tev[ptr] <= t + 1e-12:
            state[ys[ptr], xs[ptr]] += pols[ptr] * args.C
            ptr += 1
        recons.append(state.copy())
        gts.append(frames[fi])

    # affine correction over ALL val frames jointly (trainer.evaluate)
    p_logs = np.stack(recons)                       # already log-intensity
    g_logs = np.stack([linlog(g) for g in gts])
    a, b = M.solve_normal_equations(p_logs[..., None], g_logs[..., None])
    psnrs, ssims = [], []
    for j, fi in enumerate(sorted(args.val_idxs)):
        pred_c = np.exp(p_logs[j] * a + b)
        gt255 = np.exp(g_logs[j])
        p = M.psnr(pred_c, gt255, max_val=255.0)
        s = M.ssim(pred_c, gt255, data_range=255.0)
        psnrs.append(p)
        ssims.append(s)
        print(f"frame {fi}: oracle psnr_corrected={p:.2f} ssim={s:.3f}")
    print(f"ORACLE CEILING rich={args.rich} init={args.init}: "
          f"psnr_corrected={np.mean(psnrs):.2f} "
          f"ssim_corrected={np.mean(ssims):.3f} "
          f"affine_a={a:.3f} affine_b={b:.3f} "
          f"({len(ev)} events)")


if __name__ == "__main__":
    main()
