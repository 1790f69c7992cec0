"""Realistic-scale tumvie pipeline drill (VERDICT round-2 item 6).

One slow end-to-end exercise of the real-data path at production-like
event volume: a >=5M-event synthetic stream with a NONTRIVIAL radial
distortion and a stereo rig, pushed through

    distorted images -> scripts/undistort_images.py (rectify map + Knew)
    -> tumvie on-disk layout -> native event preprocessing (C++ counting
    sort, timed) -> load_tumvie_dataset -> Trainer short train ->
    stereo-view eval.

Reference role: scripts/undistort_images_tumvie.py + nerf/provider.py
:148-328 (tumvie loading incl. rectify map + EventSlicer windows) +
eval_step_tumvie stereo views (utils.py:665).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import cv2
import pytest

from enerf_tpu.data import synthetic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

K1 = -0.08  # mild barrel distortion (radial-only radtan)


def _distort_radial(xy, intr):
    """Forward radial distortion around the sim intrinsics (k1 only)."""
    fx, fy, cx, cy = intr
    xn = (xy[:, 0] - cx) / fx
    yn = (xy[:, 1] - cy) / fy
    r2 = xn * xn + yn * yn
    f = 1.0 + K1 * r2
    return np.stack([xn * f * fx + cx, yn * f * fy + cy], -1)


def _undistort_radial(xy, intr):
    """Inverse of _distort_radial via Newton on the radial factor."""
    fx, fy, cx, cy = intr
    xn = (xy[:, 0] - cx) / fx
    yn = (xy[:, 1] - cy) / fy
    rd = np.sqrt(xn * xn + yn * yn)
    ru = rd.copy()
    for _ in range(8):
        f = 1.0 + K1 * ru * ru
        ru = ru - (ru * f - rd) / (1.0 + 3.0 * K1 * ru * ru)
    s = np.where(rd > 1e-9, ru / np.maximum(rd, 1e-9), 1.0)
    return np.stack([xn * s * fx + cx, yn * s * fy + cy], -1)


@pytest.mark.slow
def test_tumvie_pipeline_drill(tmp_path_factory):
    H = W = 128
    sim = synthetic.simulate_events(H=H, W=W, n_frames=120, C=0.015,
                                    rich=2)
    n_ev = sim["events"].shape[0]
    assert n_ev >= 5_000_000, f"drill needs >=5M events, got {n_ev}"
    intr = sim["intrinsics"]

    d = str(tmp_path_factory.mktemp("tumvie_drill"))

    # ---- distorted raw images (dst(u_d) = clean(undistort(u_d))) ----
    grid = np.stack(np.meshgrid(np.arange(W, dtype=np.float32),
                                np.arange(H, dtype=np.float32),
                                indexing="xy"), -1).reshape(-1, 2)
    und = _undistort_radial(grid, intr).reshape(H, W, 2).astype(np.float32)
    rawdir = os.path.join(d, "images")
    os.makedirs(rawdir, exist_ok=True)
    for i, im in enumerate(sim["frames"]):
        img8 = (np.clip(im[..., 0], 0, 1) * 255).astype(np.uint8)
        dist = cv2.remap(img8, und[..., 0], und[..., 1], cv2.INTER_LINEAR)
        cv2.imwrite(os.path.join(rawdir, f"{i:05d}.png"), dist)

    fx, fy, cx, cy = intr
    with open(os.path.join(d, "calibration.json"), "w") as f:
        json.dump({"intrinsics": [
            {"fx": fx, "fy": fy, "cx": cx, "cy": cy,
             "k1": K1, "k2": 0.0, "p1": 0.0, "p2": 0.0}]}, f)

    # ---- the actual undistortion tool ----
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/undistort_images.py"),
         "--datadir", d, "--calib", os.path.join(d, "calibration.json"),
         "--cam", "0", "--model", "radtan", "--out_suffix", "left"],
        check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"})

    import h5py
    with h5py.File(os.path.join(d, "rectify_map_left.h5")) as f:
        rmap_tool = np.asarray(f["rectify_map"])
    with open(os.path.join(d, "calib_undist_left.json")) as f:
        knew = json.load(f)["intrinsics_undistorted"][0]

    # tool's rectify map must agree with the independent analytic
    # undistortion in the image interior (the tool projects with ITS Knew)
    interior = (slice(32, 96), slice(32, 96))
    ana = und  # analytic undistorted coords in sim-K pixels
    # convert analytic to Knew pixels
    ana_knew = np.stack([
        (ana[..., 0] - cx) / fx * knew["fx"] + knew["cx"],
        (ana[..., 1] - cy) / fy * knew["fy"] + knew["cy"]], -1)
    err = np.abs(rmap_tool[interior] - ana_knew[interior])
    assert err.max() < 0.75, f"rectify map deviates: {err.max():.2f}px"

    # ---- tumvie layout around the tool outputs ----
    from enerf_tpu.data.tumvie import save_tumvie_dataset
    save_tumvie_dataset(sim, d, scale=0.33)
    # replace identity artifacts with the realistic ones (save_tumvie
    # wrote an identity rectify map over the tool's — restore the tool's)
    from enerf_tpu.data.h5events import write_rectify_map
    write_rectify_map(os.path.join(d, "rectify_map_left.h5"), rmap_tool)
    import shutil
    imgdir = os.path.join(d, "left_images_undistorted")
    for p in os.listdir(os.path.join(d, "images_undistorted_left")):
        shutil.copy(os.path.join(d, "images_undistorted_left", p),
                    os.path.join(imgdir, p))
    # distorted event coords (clipped to the sensor) + grouped h5
    ev = sim["events"][np.argsort(sim["events"][:, 2], kind="stable")]
    dist_xy = _distort_radial(ev[:, :2], intr)
    ok = ((dist_xy[:, 0] >= 0) & (dist_xy[:, 0] <= W - 1)
          & (dist_xy[:, 1] >= 0) & (dist_xy[:, 1] <= H - 1))
    ev, dist_xy = ev[ok], np.floor(dist_xy[ok])
    from enerf_tpu.data.h5events import write_event_h5
    write_event_h5(os.path.join(d, "events_left.h5"),
                   dist_xy[:, 0], dist_xy[:, 1], ev[:, 2] * 1e6,
                   (ev[:, 3] > 0).astype(np.int8), grouped=True)
    # stereo rig: event camera offset 2 cm along x (cams 2/3)
    with open(os.path.join(d, "calib_undist.json")) as f:
        cal = json.load(f)
    for ci in (0, 1, 2, 3):
        cal["value0"]["intrinsics_undistorted"][ci] = {
            "fx": knew["fx"], "fy": knew["fy"],
            "cx": knew["cx"], "cy": knew["cy"]}
    for ci in (2, 3):
        cal["value0"]["T_imu_cam"][ci] = {
            "px": 0.02, "py": 0.0, "pz": 0.0,
            "qx": 0.0, "qy": 0.0, "qz": 0.0, "qw": 1.0}
    with open(os.path.join(d, "calib_undist.json"), "w") as f:
        json.dump(cal, f)

    # ---- native preprocessing wall-clock at the 5M scale ----
    from enerf_tpu.data import native_events as NE
    xs = dist_xy[:, 0].astype(np.float32)
    ys = dist_xy[:, 1].astype(np.float32)
    ts = ev[:, 2].astype(np.float64)
    fids = np.minimum((ev[:, 2] * 119).astype(np.int32), 118)
    assert NE.available(), "native event-preproc library must build"
    t0 = time.perf_counter()
    order, gid, n_groups = NE.sort_events_by_pixel(xs, ys, ts, fids, W, H)
    dt_native = time.perf_counter() - t0
    assert n_groups > 0 and order.shape[0] == xs.shape[0]
    print(f"[drill] native sort_events_by_pixel: {len(xs)/1e6:.2f}M events "
          f"in {dt_native*1e3:.0f} ms "
          f"({len(xs)/max(dt_native,1e-9)/1e6:.1f} M ev/s)")

    # ---- load -> short train -> stereo eval ----
    from enerf_tpu.config import Config
    from enerf_tpu.train.trainer import Trainer
    from enerf_tpu.data.provider import make_providers

    outdir = str(tmp_path_factory.mktemp("drill_ws"))
    cfg = Config(
        mode="tumvie", datadir=d, events=1, event_only=1, out_dim_color=1,
        use_luma=0, pp_poses_sphere=1, eval_stereo_views=1,
        batch_size_evs=1024, num_rays=1024, C_thres=0.015, linlog=1,
        negative_event_sampling=0, num_steps=48, upsample_steps=0,
        bound=1.0, scale=0.33, iters=200, eval_interval=2,
        # without val_idxs the tumvie val split is ALL 120 frames — the
        # CPU eval (full view + stereo view each) would take hours
        val_idxs=[20, 60, 100],
        outdir=outdir, expname="drill", expweek="t", ckpt="scratch",
        lr=5e-3, max_ray_batch=4096, log_every=50, fuse_steps=1,
    ).validate()
    t0 = time.perf_counter()
    train_p, val_p = make_providers(cfg)
    print(f"[drill] providers built (5M-event load + windows + chains) in "
          f"{time.perf_counter()-t0:.1f} s")
    tr = Trainer(cfg, use_checkpoint="scratch")
    tr.train(train_p, val_p, max_epoch=2)
    res = tr.evaluate(val_p, save=True)
    assert np.isfinite(res.get("psnr_corrected", res.get("psnr", 0.0)))
    # stereo views were rendered (event-camera poses at val timestamps)
    assert val_p.stereo_views


def test_e2vid_undistort_produces_loader_folder(tmp_path):
    """Producer side of the e2vid path (VERDICT r4 missing 3): the --e2vid
    mode of scripts/undistort_images.py must write the exact
    `e2calib_undistorted/` folder that resolve_image_dir consumes for
    --e2vid N runs.  Reference role: scripts/undistort_e2vid_eds.py."""
    H = W = 96
    d = str(tmp_path)
    indir = os.path.join(d, "e2vids", "left", "e2vid_up4_freq0", "e2calib")
    os.makedirs(indir)
    fx = fy = 80.0
    cx, cy = W / 2.0, H / 2.0
    intr = (fx, fy, cx, cy)

    # clean test card -> distorted frames (dst(u_d) = clean(undistort(u_d)))
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    clean = ((xx // 12 + yy // 12) % 2 * 200 + 30).astype(np.uint8)
    grid = np.stack([xx, yy], -1).reshape(-1, 2).astype(np.float32)
    und = _undistort_radial(grid, intr).reshape(H, W, 2).astype(np.float32)
    for i in range(4):
        dist = cv2.remap(clean, und[..., 0], und[..., 1], cv2.INTER_LINEAR)
        cv2.imwrite(os.path.join(indir, f"recon_{i:04d}.png"), dist)
    with open(os.path.join(d, "calibration.json"), "w") as f:
        json.dump({"intrinsics": [
            {"fx": fx, "fy": fy, "cx": cx, "cy": cy,
             "k1": K1, "k2": 0.0, "p1": 0.0, "p2": 0.0}]}, f)

    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/undistort_images.py"),
         "--e2vid", "--indir", indir + "/",
         "--calib", os.path.join(d, "calibration.json"),
         "--cam", "0", "--model", "radtan"],
        check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"})

    outdir = os.path.join(d, "e2vids", "left", "e2vid_up4_freq0",
                          "e2calib_undistorted")
    frames = sorted(os.listdir(outdir))
    pngs = [p for p in frames if p.endswith(".png")]
    assert len(pngs) == 4
    assert pngs[0] == f"{0:021d}.png", pngs[0]

    # the folder is exactly what the eds e2vid loader pattern resolves
    from enerf_tpu.data.provider import resolve_image_dir
    got, kind = resolve_image_dir(d, "eds", e2vid=4)
    assert kind == "e2vid"
    assert os.path.normpath(got) == os.path.normpath(outdir)

    # undistorting the distorted card must recover the clean card away
    # from the border (remap fill regions excluded)
    rec = cv2.imread(os.path.join(outdir, pngs[0]))[..., 0].astype(np.float32)
    center = (slice(24, 72), slice(24, 72))
    err = np.abs(rec[center] - clean[center].astype(np.float32))
    assert np.median(err) < 8.0, f"median err {np.median(err):.1f}"


if __name__ == "__main__":
    test_tumvie_pipeline_drill  # run via pytest --full
