"""EDS dataset loader (real event sequences, stamped groundtruth poses).

Parity: reference nerf/provider.py —
  - load_event_data_EDS (:249-328): events.h5 with t_offset, windows
    centered between image timestamps, rectify_map_calib0.h5 undistortion,
    polarity -> +-1, us -> ns
  - convert_EDS_to_posesBds_and_hfPoses (:770-810):
    stamped_groundtruth_us.txt quatlist (c2w of the event camera),
    hard-coded T_ev_rgb extrinsics for calib0/calib1 (:538-566),
    images_timestamps_us.txt, rub conversion + nerf_matrix_to_ngp
    (eds configs always use pp_poses_sphere=0, main_nerf.py:81-82)
"""

import glob
import os

import numpy as np
import cv2
import h5py
from scipy.spatial.transform import Rotation as Rot

from enerf_tpu.data.h5events import EventSlicer
from enerf_tpu.data.poses import (
    get_hom_trafos, make_pose_interpolator, nerf_matrix_to_ngp,
)
from enerf_tpu.data.provider import rub_from_rdf
from enerf_tpu.data.tumvie import slice_events_per_frame

# reference provider.py:556-566 (calib0 camera extrinsics)
T_EV_RGB_CALIB0 = np.asarray([
    [0.9998964430808897, -0.0020335804041023736, -0.014246672065022661, -0.00011238613157578769],
    [0.001703024953250547, 0.9997299470300024, -0.023176123864880376, -0.0005981481496958399],
    [0.014289955220253567, 0.02314946137886846, 0.9996298813149167, -0.004416681577516066],
    [0.0, 0.0, 0.0, 1.0],
])


def load_eds_dataset(datadir, scale=0.33, out_dim_color=1, downscale=1,
                     calibstr="calib0", hotpixs=False, select_idxs=None,
                     intrinsics=None, intrinsics_evs=None, e2vid=0,
                     images_corrupted=False):
    """Load an EDS-format directory into the provider dict.

    intrinsics/intrinsics_evs override the calib json (fx, fy, cx, cy).
    """
    import json

    calib_path = os.path.join(datadir, f"calib_undist_{calibstr}.json")
    if intrinsics is None and os.path.exists(calib_path):
        with open(calib_path) as f:
            calib = json.load(f)
        intr = calib["intrinsics_undistorted"][0]
        intr_evs = calib["intrinsics_undistorted"][1]
        intrinsics = (intr["fx"], intr["fy"], intr["cx"], intr["cy"])
        intrinsics_evs = (intr_evs["fx"], intr_evs["fy"], intr_evs["cx"], intr_evs["cy"])

    # images (source switching: clean / e2vid / corrupted — reference
    # provider.py:505-510, 731-735)
    from enerf_tpu.data.provider import resolve_image_dir
    imgdir = os.path.join(datadir, f"images_undistorted_{calibstr}")
    if not os.path.isdir(imgdir):
        imgdir = os.path.join(datadir, "images")
    imgdir, _kind = resolve_image_dir(datadir, "eds", e2vid,
                                      images_corrupted, default_dir=imgdir)
    tss_imgs_us = np.loadtxt(os.path.join(datadir, "images_timestamps_us.txt"))
    img_paths = sorted(
        glob.glob(os.path.join(imgdir, "*.png")) + glob.glob(os.path.join(imgdir, "*.jpg"))
    )
    if select_idxs is not None:
        tss_imgs_us = tss_imgs_us[select_idxs]
        img_paths = [img_paths[i] for i in select_idxs]
    from enerf_tpu.data.provider import read_image
    images = np.stack(
        [read_image(p, out_dim_color, downscale) for p in img_paths])
    H, W = images.shape[1:3]
    if intrinsics is not None and downscale > 1:
        # frame-camera intrinsics follow the image resize (events keep the
        # full event-camera resolution, matching the reference)
        intrinsics = tuple(v / downscale for v in intrinsics)
    if intrinsics is None:
        f = 0.7 * W
        intrinsics = (f, f, W / 2.0, H / 2.0)
        intrinsics_evs = intrinsics

    # groundtruth poses: c2w of the EVENT camera (rdf)
    quatlist = np.loadtxt(os.path.join(datadir, "stamped_groundtruth_us.txt"), skiprows=1)
    assert quatlist.shape[1] == 8
    hf_ts_us = quatlist[:, 0]
    rots = Rot.from_quat(quatlist[:, 4:8]).as_matrix()
    hf_ev_raw = get_hom_trafos(rots, quatlist[:, 1:4])

    to_final = lambda p: nerf_matrix_to_ngp(rub_from_rdf(p[None])[0], scale=scale)
    hf_poses_ev = np.stack([to_final(p) for p in hf_ev_raw])

    # frame-camera poses: T_w_rgb = T_w_ev @ T_ev_rgb (reference convention)
    hf_rgb_raw = np.einsum("nij,jk->nik", hf_ev_raw, T_EV_RGB_CALIB0)
    interp_rgb = make_pose_interpolator(hf_ts_us, hf_rgb_raw)
    img_poses = np.stack(
        [to_final(np.vstack([p, [0, 0, 0, 1]]))
         for p in interp_rgb(np.clip(tss_imgs_us, hf_ts_us[0], hf_ts_us[-1]))]
    )

    # events
    h5file = os.path.join(datadir, "events.h5")
    if hotpixs:
        h5file = glob.glob(os.path.join(datadir, "events_hotpixs_*.h5"))[0]
    rmap_path = os.path.join(datadir, f"rectify_map_{calibstr}.h5")
    rectify_map = None
    if os.path.exists(rmap_path):
        with h5py.File(rmap_path, "r") as f:
            rectify_map = np.asarray(f["rectify_map"])
    with h5py.File(h5file, "r") as f:
        slicer = EventSlicer(f)
        events, frame_ids = slice_events_per_frame(slicer, tss_imgs_us, rectify_map)

    return {
        "images": images,
        "tss_imgs_ns": tss_imgs_us * 1000.0,
        "poses": img_poses,
        "intrinsics": intrinsics,
        "intrinsics_evs": intrinsics_evs,
        "hf_ts": hf_ts_us * 1000.0,
        "hf_poses": hf_poses_ev,
        "events": events,
        "event_frame_ids": frame_ids,
        "H": H,
        "W": W,
        "H_ev": H,
        "W_ev": W,
    }


def save_eds_dataset(data, datadir, scale=0.33):
    """Write a synthetic dataset (data/synthetic.simulate_events output) in
    the EDS on-disk format: events.h5 (us timestamps + ms_to_idx + t_offset),
    stamped_groundtruth_us.txt, images + images_timestamps_us.txt.
    The GT quatlist stores the EVENT camera c2w; the frame camera is the
    same camera (identity T_ev_rgb is a valid calib for fixtures)."""
    import json as _json
    from enerf_tpu.data.h5events import write_event_h5
    from enerf_tpu.data.provider import raw_rdf_from_ngp

    os.makedirs(os.path.join(datadir, "images"), exist_ok=True)
    ts_us = data["frame_ts"] * 1e6

    np.savetxt(os.path.join(datadir, "images_timestamps_us.txt"), ts_us)
    for i, im in enumerate(data["frames"]):
        img8 = (np.clip(im[..., 0], 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(datadir, "images", f"frame_{i:010d}.png"), img8)

    hf_t = np.linspace(data["frame_ts"][0], data["frame_ts"][-1], 4 * len(ts_us))
    rows = []
    for t in hf_t:
        # fixture uses identity T_ev_rgb: event cam == frame cam
        raw = raw_rdf_from_ngp(data["pose_fn"](t), scale)
        q = Rot.from_matrix(raw[:3, :3]).as_quat()
        rows.append([t * 1e6, *raw[:3, 3], *q])
    np.savetxt(os.path.join(datadir, "stamped_groundtruth_us.txt"),
               np.asarray(rows), header="ts_us px py pz qx qy qz qw")

    ev = data["events"]
    order = np.argsort(ev[:, 2], kind="stable")
    ev = ev[order]
    write_event_h5(
        os.path.join(datadir, "events.h5"),
        ev[:, 0], ev[:, 1], ev[:, 2] * 1e6, (ev[:, 3] > 0).astype(np.int8),
        t_offset=0,
    )

    fx, fy, cx, cy = data["intrinsics"]
    calib = {"intrinsics_undistorted": [
        {"fx": fx, "fy": fy, "cx": cx, "cy": cy},
        {"fx": fx, "fy": fy, "cx": cx, "cy": cy},
    ]}
    with open(os.path.join(datadir, "calib_undist_calib0.json"), "w") as f:
        _json.dump(calib, f)
    return datadir
