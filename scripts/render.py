"""Standalone offline renderer from a trained workspace.

Parity: reference scripts/render.py — re-parses the config snapshot saved in
the model workspace (:73-171, 352-358), loads the checkpoint, builds poses
from a quatlist txt (`--infile`), a spiral path, or interpolated dataset
poses (:219-317, 364-432), renders each pose staged and writes
rgb/depth/raw (:489-511).

Usage:
  python scripts/render.py --model_dir <workspace> [--infile poses.txt]
      [--traj spiral|val] [--n_poses 60] [--outdir renders]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("ENERF_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["ENERF_PLATFORM"])


def load_quatlist_poses(path):
    """Rows [ts, px, py, pz, qx, qy, qz, qw] -> [N, 4, 4] c2w (final frame)."""
    from scipy.spatial.transform import Rotation as R
    from enerf_tpu.data.poses import get_hom_trafos

    q = np.loadtxt(path, skiprows=1)
    if q.ndim == 1:
        q = q[None]
    rots = R.from_quat(q[:, 4:8]).as_matrix()
    return get_hom_trafos(rots, q[:, 1:4])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True, help="trained workspace")
    ap.add_argument("--infile", default=None, help="quatlist txt of poses")
    ap.add_argument("--traj", default="spiral", choices=["spiral", "val"])
    ap.add_argument("--n_poses", type=int, default=60)
    ap.add_argument("--H", type=int, default=None)
    ap.add_argument("--W", type=int, default=None)
    ap.add_argument("--fovy", type=float, default=None)
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--ckpt", default="latest")
    args = ap.parse_args(argv)

    from enerf_tpu.config import Config
    from enerf_tpu.train.trainer import Trainer
    from enerf_tpu.data import synthetic
    from enerf_tpu.data.poses import spiral_path, poses_avg

    # re-parse the config snapshot (reference render.py:352-358)
    with open(os.path.join(args.model_dir, "args.json")) as f:
        cfg_dict = json.load(f)
    cfg_dict["render_mode"] = 1
    cfg = Config(**{k: v for k, v in cfg_dict.items()
                    if k in Config.__dataclass_fields__})

    trainer = Trainer(cfg, workspace=args.model_dir, use_checkpoint=args.ckpt,
                      snapshot=False)  # read-only: keep train provenance

    H = args.H or cfg.H
    W = args.W or cfg.W
    intr = synthetic.default_intrinsics(H, W, args.fovy or cfg.fovy)

    if args.infile:
        poses = load_quatlist_poses(args.infile)
    elif args.traj == "spiral":
        center = np.eye(4)
        center[:3, 3] = [0, 0, -2.0]
        poses = spiral_path(center, [0.8, 0.8, 0.3], 2.0, args.n_poses)
    else:
        poses = np.stack(
            [synthetic.circle_pose(t) for t in np.linspace(0, 1, args.n_poses)]
        )

    outdir = args.outdir or os.path.join(args.model_dir, "renders")
    os.makedirs(outdir, exist_ok=True)
    import cv2

    for i, pose in enumerate(poses):
        img, depth = trainer.render_view(pose, intr, H, W)
        img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        if img8.shape[-1] == 3:
            img8 = cv2.cvtColor(img8, cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(outdir, f"{i:04d}.png"), img8)
        cv2.imwrite(os.path.join(outdir, f"{i:04d}_depth.png"),
                    (np.clip(depth, 0, 1) * 255).astype(np.uint8))
        np.save(os.path.join(outdir, f"{i:04d}_raw.npy"), img)
        print(f"rendered {i + 1}/{len(poses)}", flush=True)
    print(f"wrote {len(poses)} renders to {outdir}")


if __name__ == "__main__":
    main()
