"""Inspect/repair an event H5: print stats, rebuild ms_to_idx, dump an
event-accumulation visualization.

Parity: reference scripts/ms_to_idx_and_vis_h5.py + plot_h5.py.

Usage: python scripts/inspect_h5.py events.h5 [--fix_ms_to_idx] [--vis out.png]
"""

import argparse
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("h5", help="event h5 file")
    ap.add_argument("--fix_ms_to_idx", action="store_true")
    ap.add_argument("--vis", default=None, help="write accumulation png")
    ap.add_argument("--n_vis", type=int, default=200000)
    args = ap.parse_args(argv)

    from enerf_tpu.data.h5events import compute_ms_to_idx
    from enerf_tpu.utils.plotting import render_ev_accumulation

    mode = "r+" if args.fix_ms_to_idx else "r"
    with h5py.File(args.h5, mode) as f:
        prefix = "events/" if "events/x" in f else ""
        t = f[prefix + "t"]
        n = t.shape[0]
        print(f"{args.h5}: {n} events")
        print(f"  t: [{t[0]}, {t[-1]}] ({(int(t[-1]) - int(t[0])) / 1e6:.3f} s if us)")
        for k in ("x", "y", "p"):
            d = f[prefix + k]
            print(f"  {k}: min={d[:].min()} max={d[:].max()} dtype={d.dtype}")
        if "t_offset" in f.keys():
            print(f"  t_offset: {int(f['t_offset'][()])}")
        has_idx = "ms_to_idx" in f.keys()
        print(f"  ms_to_idx: {'present' if has_idx else 'MISSING'}")
        if args.fix_ms_to_idx:
            idx = compute_ms_to_idx(np.asarray(t), tick_ns=1000)
            if has_idx:
                del f["ms_to_idx"]
            f.create_dataset("ms_to_idx", data=idx)
            print(f"  rebuilt ms_to_idx ({len(idx)} entries)")
        if args.vis:
            import cv2
            k = min(args.n_vis, n)
            xs = np.asarray(f[prefix + "x"][:k])
            ys = np.asarray(f[prefix + "y"][:k])
            # widen BEFORE the {0,1} -> {-1,1} remap: uint8 0*2-1 wraps to
            # 255 and every event would render positive
            ps = np.asarray(f[prefix + "p"][:k]).astype(np.int16)
            H, W = int(ys.max()) + 1, int(xs.max()) + 1
            img = render_ev_accumulation(xs, ys, ps * 2 - 1 if ps.min() >= 0 else ps, H, W)
            cv2.imwrite(args.vis, img)
            print(f"  wrote {args.vis}")


if __name__ == "__main__":
    main()
