"""Undistort frames + build the event-camera rectify map.

Parity: reference scripts/undistort_images_tumvie.py / _eds.py — undistorts
every frame with the calibrated camera model and writes the event-camera
`rectify_map_*.h5` (per-pixel undistorted target coordinates) used by the
event loaders, plus the undistorted intrinsics json.

Usage:
  python scripts/undistort_images.py --datadir SEQ --calib calibration.json \
      --cam 0 --model radtan --out_suffix calib0
Calibration json: {"intrinsics": [{"fx","fy","cx","cy","k1","k2","p1","p2"
 [,"k3","k4"]}, ...]}; model 'radtan' (OpenCV) or 'fisheye' (equidistant).

E2VID mode (reference scripts/undistort_e2vid_eds.py / _tumvie.py roles):
  python scripts/undistort_images.py --e2vid --indir SEQ/e2vids/left/\
e2vid_up4_freq0/e2calib/ --calib calibration.json --cam 0 --model radtan
Undistorts every E2VID-reconstructed frame with the EVENT camera model
(radtan/alpha=0 for EDS, fisheye/balance=0.5 for TUMVIE — the reference's
hard-coded per-dataset calibs become the --calib json here) and writes
sequential %021d.png frames into the sibling `e2calib_undistorted/`
folder that resolve_image_dir (data/provider.py:75-100) consumes for
--e2vid N runs.
"""

import argparse
import glob
import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_maps(intr, H, W, model, balance=0.0):
    K = np.array([[intr["fx"], 0, intr["cx"]], [0, intr["fy"], intr["cy"]], [0, 0, 1]])
    if model == "fisheye":
        D = np.array([intr.get(k, 0.0) for k in ("k1", "k2", "k3", "k4")])
        Knew = cv2.fisheye.estimateNewCameraMatrixForUndistortRectify(
            K, D, (W, H), np.eye(3), balance=balance
        )
        m1, m2 = cv2.fisheye.initUndistortRectifyMap(
            K, D, np.eye(3), Knew, (W, H), cv2.CV_32FC1
        )
        pts = cv2.fisheye.undistortPoints(
            _grid_pts(H, W), K, D, R=np.eye(3), P=Knew
        )
    else:
        # OpenCV radtan order (k1, k2, p1, p2[, k3]) — include k3 when the
        # calibration provides it (5-term model)
        D = np.array([intr.get(k, 0.0)
                      for k in ("k1", "k2", "p1", "p2", "k3")])
        if intr.get("k3") is None:
            D = D[:4]
        Knew, _ = cv2.getOptimalNewCameraMatrix(K, D, (W, H), 0)
        m1, m2 = cv2.initUndistortRectifyMap(K, D, np.eye(3), Knew, (W, H), cv2.CV_32FC1)
        pts = cv2.undistortPoints(_grid_pts(H, W), K, D, R=np.eye(3), P=Knew)
    rectify_map = pts.reshape(H, W, 2)
    return m1, m2, Knew, rectify_map


def _grid_pts(H, W):
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    return np.stack([xs, ys], -1).reshape(-1, 1, 2)


def undistort_e2vid(args):
    """Undistort E2VID reconstructions into e2calib_undistorted/.

    Mirrors reference undistort_e2vid_eds.py (radtan: alpha=0 new camera,
    undistort + remap cross-check at PSNR>50) and undistort_e2vid_tumvie.py
    (fisheye: balance=0.5).  Frames renumber to the reference's %021d.png.
    """
    with open(args.calib) as f:
        intr = json.load(f)["intrinsics"][args.cam]
    imgs = sorted(p for p in glob.glob(os.path.join(args.indir, "*.png")))
    assert imgs, f"no .png frames under {args.indir}"
    H, W = cv2.imread(imgs[0]).shape[:2]
    balance = 0.5 if args.model == "fisheye" else 0.0
    m1, m2, Knew, _ = build_maps(intr, H, W, args.model, balance=balance)

    outdir = os.path.join(os.path.dirname(args.indir.rstrip("/")),
                          "e2calib_undistorted")
    os.makedirs(outdir, exist_ok=True)
    for i, p in enumerate(imgs):
        im = cv2.imread(p)
        und = cv2.remap(im, m1, m2, cv2.INTER_LINEAR)
        if args.model == "radtan" and i == 0:
            # reference _eds.py cross-check: direct undistort and the
            # precomputed remap must agree (catches a wrong new-camera K)
            K = np.array([[intr["fx"], 0, intr["cx"]],
                          [0, intr["fy"], intr["cy"]], [0, 0, 1]])
            D = np.array([intr.get(k, 0.0) for k in ("k1", "k2", "p1", "p2")])
            direct = cv2.undistort(im, K, D, newCameraMatrix=Knew)
            mse = np.mean((direct.astype(np.float32) - und.astype(np.float32)) ** 2)
            psnr = -10 * np.log10(max(mse, 1e-10)) + 20 * np.log10(255.0)
            assert psnr > 50, f"undistort/remap disagree (psnr {psnr:.1f})"
        cv2.imwrite(os.path.join(outdir, f"{i:021d}.png"), und)
    with open(os.path.join(outdir, "..", "calib_undist_e2vid.json"), "w") as f:
        json.dump({"intrinsics_undistorted": [{
            "fx": float(Knew[0, 0]), "fy": float(Knew[1, 1]),
            "cx": float(Knew[0, 2]), "cy": float(Knew[1, 2]),
        }]}, f, indent=2)
    print(f"undistorted {len(imgs)} e2vid frames -> {outdir}")
    return outdir


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--datadir")
    ap.add_argument("--calib", required=True)
    ap.add_argument("--cam", type=int, default=0)
    ap.add_argument("--model", default="radtan", choices=["radtan", "fisheye"])
    ap.add_argument("--img_glob", default="images/*.png")
    ap.add_argument("--out_suffix", default="calib0")
    ap.add_argument("--e2vid", action="store_true",
                    help="undistort an E2VID reconstruction folder "
                         "(--indir) instead of dataset frames")
    ap.add_argument("--indir", help="e2vid mode: the e2calib/ input folder")
    args = ap.parse_args(argv)

    if args.e2vid:
        assert args.indir, "--e2vid requires --indir (the e2calib/ folder)"
        undistort_e2vid(args)
        return
    assert args.datadir, "--datadir is required (frame mode)"

    from enerf_tpu.data.h5events import write_rectify_map

    with open(args.calib) as f:
        calib = json.load(f)
    intr = calib["intrinsics"][args.cam]

    imgs = sorted(glob.glob(os.path.join(args.datadir, args.img_glob)))
    assert imgs, f"no images matching {args.img_glob}"
    H, W = cv2.imread(imgs[0]).shape[:2]
    m1, m2, Knew, rectify_map = build_maps(intr, H, W, args.model)

    outdir = os.path.join(args.datadir, f"images_undistorted_{args.out_suffix}")
    os.makedirs(outdir, exist_ok=True)
    for p in imgs:
        im = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        und = cv2.remap(im, m1, m2, cv2.INTER_LINEAR)
        cv2.imwrite(os.path.join(outdir, os.path.basename(p)), und)

    write_rectify_map(
        os.path.join(args.datadir, f"rectify_map_{args.out_suffix}.h5"), rectify_map
    )
    undist = {
        "intrinsics_undistorted": [{
            "fx": float(Knew[0, 0]), "fy": float(Knew[1, 1]),
            "cx": float(Knew[0, 2]), "cy": float(Knew[1, 2]),
        }]
    }
    with open(os.path.join(args.datadir, f"calib_undist_{args.out_suffix}.json"), "w") as f:
        json.dump(undist, f, indent=2)
    print(f"undistorted {len(imgs)} images -> {outdir}; wrote rectify map + intrinsics")


if __name__ == "__main__":
    main()
