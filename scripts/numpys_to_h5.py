"""Convert esim per-interval event .npy files into one H5 with ms_to_idx.

Parity: reference scripts/numpys_to_h5.py (esim npy -> H5 + millisecond
index for EventSlicer consumption).

Usage: python scripts/numpys_to_h5.py --datadir DATA/seq --out events.h5
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--datadir", required=True, help="dir containing events/*.npy")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from enerf_tpu.data.h5events import write_event_h5

    files = sorted(glob.glob(os.path.join(args.datadir, "events", "*.npy")))
    assert files, f"no event npys under {args.datadir}/events"
    evs = np.concatenate([np.load(f)[:, :4] for f in files])
    order = np.argsort(evs[:, 2], kind="stable")
    evs = evs[order]
    # esim timestamps are ns; H5 layout stores us
    t_us = evs[:, 2] / 1000.0
    p = evs[:, 3]
    p01 = (p > 0).astype(np.int8) if set(np.unique(p)) <= {-1.0, 1.0} else p.astype(np.int8)
    out = args.out or os.path.join(args.datadir, "events.h5")
    write_event_h5(out, evs[:, 0], evs[:, 1], t_us, p01, t_offset=0)
    print(f"wrote {len(evs)} events -> {out}")


if __name__ == "__main__":
    main()
