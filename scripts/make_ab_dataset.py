"""Write the SHARED synthetic esim datasets for the head-to-head quality A/B.

Two scenes (the round-2 quality testbeds, ROUND2_STATUS.md):
  smooth   — rich=1 blob ring (low-texture; silhouette-dominated events)
  textured — rich=2 textured scene (event supervision is sufficient; this
             is what the reference's real esim rooms look like)

Both are written in the reference's esim on-disk format (events/*.npy with
(x, y, ts_ns, p) rows, images/ + image_stamps_ns.txt, poses_all.txt raw-RDF
quatlist, poses_bounds.npy) via enerf_tpu.data.provider.save_esim_dataset,
so the SAME directory is loadable by
  - the reference loader (reference nerf/provider.py:84-93 + :720-768), and
  - our loader (enerf_tpu/data/provider.py load_esim_dataset).

Usage: python scripts/make_ab_dataset.py --out output/ab_data [--H 64] ...
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    jax.config.update("jax_platforms", "cpu")
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--H", type=int, default=64)
    p.add_argument("--W", type=int, default=64)
    p.add_argument("--frames", type=int, default=120)
    # Per-scene contrast thresholds: the reference's event sampler needs
    # same-pixel successor events inside EVERY train batch (incl. the
    # structural single-interval final batch, provider.py:58-61) — the
    # low-texture smooth scene only reaches that density at C=0.05
    # (measured: >=25 same-pixel-pair pixels per interval; C=0.2 gives 0).
    p.add_argument("--C_smooth", type=float, default=0.05)
    p.add_argument("--C_textured", type=float, default=0.2)
    p.add_argument("--turns", type=float, default=0.5)
    p.add_argument("--scale", type=float, default=0.33,
                   help="pose scale baked into poses_all.txt (both loaders "
                        "must be run with the same --scale)")
    args = p.parse_args()

    from enerf_tpu.data import synthetic
    from enerf_tpu.data.provider import save_esim_dataset

    for name, rich, C in (("smooth", 1, args.C_smooth),
                          ("textured", 2, args.C_textured)):
        d = os.path.join(args.out, name)
        data = synthetic.simulate_events(
            H=args.H, W=args.W, n_frames=args.frames, C=C,
            turns=args.turns, rich=rich)
        save_esim_dataset(data, d, scale=args.scale)
        meta = {
            "scene": name, "rich": rich, "H": args.H, "W": args.W,
            "frames": args.frames, "C": C, "turns": args.turns,
            "scale": args.scale, "n_events": int(data["events"].shape[0]),
        }
        with open(os.path.join(d, "ab_meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
        print(f"wrote {d}: {meta['n_events']} events, "
              f"{args.frames} frames {args.H}x{args.W}")


if __name__ == "__main__":
    main()
