"""TUM-VIE dataset loader (real event-camera data, mocap poses).

Parity: reference nerf/provider.py —
  - load_event_data_tumvie (:148-244): H5 event stream sliced into windows
    centered between image timestamps, undistorted through the
    rectify_map H5, polarity {0,1} -> {-1,+1}, timestamps us -> ns, event
    subsampling when the total window exceeds 10 s
  - convert_tumvie_to_posesBds_and_hfPoses (:812-867): mocap marker
    quatlist (us), calib_undist.json + mocap-imu-calib.json extrinsics,
    c2w = T_mocap_marker @ inv(T_imu_marker) @ T_imu_cam, optional sphere
    preprocessing, rub conversion + nerf_matrix_to_ngp
  - stereo intrinsics: camId 0/1 frame cameras, camIdEvs 2/3 event cameras
    (:504-533); event-camera resolution 1280x720

The loader returns the same provider dict shape as load_esim_dataset, with
separate frame-camera and event-camera intrinsics (the reference's
`*_evs` keys, provider.py:946-951).
"""

import glob
import json
import os

import numpy as np
import cv2
import h5py
from scipy.spatial.transform import Rotation as Rot

from enerf_tpu.data.h5events import EventSlicer
from enerf_tpu.data.poses import (
    get_hom_trafos, make_pose_interpolator, nerf_matrix_to_ngp,
    preprocess_pose_array_sphere,
)
from enerf_tpu.data.provider import rub_from_rdf

MAX_EVENT_WINDOW_US = 10 * 1e6  # provider.py:189


def _quat_dict_to_hom(d):
    out = np.eye(4)
    out[:3, :3] = Rot.from_quat([d["qx"], d["qy"], d["qz"], d["qw"]]).as_matrix()
    out[:3, 3] = [d["px"], d["py"], d["pz"]]
    return out


def event_window_centers(tss_imgs_us):
    """Window centers between image timestamps (provider.py:174-179)."""
    dT_us = np.diff(tss_imgs_us).mean()
    c = np.insert(tss_imgs_us, 0, tss_imgs_us[0] - 2 * dT_us)
    c = np.append(c, c[-1] + 2 * dT_us)
    c = c[:-1] + np.diff(c) / 2.0
    assert np.all(np.diff(c) > 0)
    return c


def slice_events_per_frame(slicer, tss_imgs_us, rectify_map=None,
                           max_window_us=MAX_EVENT_WINDOW_US):
    """Windowed, undistorted event batches per image (provider.py:186-244).

    Returns (events [M, 4] (x, y, t_ns, pol in +-1), frame_ids [M]).
    """
    centers = event_window_centers(tss_imgs_us)
    dT_us = 0.0
    total = centers[-1] - centers[0]
    if total > max_window_us:
        dT_us = (total - max_window_us) / (2 * len(tss_imgs_us))

    out, fids = [], []
    for i in range(len(tss_imgs_us)):
        t0 = centers[i] + dT_us
        t1 = centers[i + 1] - dT_us
        ev = slicer.get_events(int(t0), int(t1))
        if ev is None or ev["t"].size == 0:
            continue
        n = ev["t"].size
        tmp = np.zeros((n, 4))
        if rectify_map is not None:
            rect = rectify_map[ev["y"].astype(np.int64), ev["x"].astype(np.int64)]
            tmp[:, 0] = rect[..., 0]
            tmp[:, 1] = rect[..., 1]
        else:
            tmp[:, 0] = ev["x"]
            tmp[:, 1] = ev["y"]
        tmp[:, 2] = ev["t"] * 1000.0  # us -> ns
        p = ev["p"].astype(np.float64)
        tmp[:, 3] = p * 2.0 - 1.0 if set(np.unique(p)) <= {0.0, 1.0} else p
        out.append(tmp)
        fids.append(np.full(n, i, np.int64))
    if not out:
        return np.zeros((0, 4)), np.zeros((0,), np.int64)
    return np.concatenate(out), np.concatenate(fids)


def load_tumvie_dataset(datadir, scale=0.33, out_dim_color=1, downscale=1,
                        pp_poses_sphere=True, cam="left", hotpixs=False,
                        select_idxs=None, workspace=None, e2vid=0,
                        images_corrupted=False):
    """Load a TUM-VIE-format directory into the provider dict."""
    suffix = cam + ("_hotpixs" if hotpixs else "")

    # calib
    with open(os.path.join(datadir, "calib_undist.json")) as f:
        calib = json.load(f)["value0"]
    with open(os.path.join(datadir, "mocap-imu-calib.json")) as f:
        calib.update(json.load(f)["value0"])
    cam_id = 0 if cam == "left" else 1
    cam_id_evs = 2 if cam == "left" else 3
    intr = calib["intrinsics_undistorted"][cam_id]
    intr_evs = calib["intrinsics_undistorted"][cam_id_evs]
    T_imu_cam = _quat_dict_to_hom(calib["T_imu_cam"][cam_id])
    T_imu_evcam = _quat_dict_to_hom(calib["T_imu_cam"][cam_id_evs])
    T_imu_marker = _quat_dict_to_hom(calib["T_imu_marker"])

    # images (source switching: clean / e2vid / corrupted — reference
    # provider.py:540-545, 731-735)
    from enerf_tpu.data.provider import resolve_image_dir
    clean_dir = os.path.join(datadir, f"{cam}_images_undistorted")
    imgdir, _kind = resolve_image_dir(datadir, "tumvie", e2vid,
                                      images_corrupted, default_dir=clean_dir)
    tss_imgs_us = np.loadtxt(
        os.path.join(clean_dir, f"image_timestamps_{cam}.txt"))
    img_paths = sorted(
        glob.glob(os.path.join(imgdir, "*.jpg")) + glob.glob(os.path.join(imgdir, "*.png"))
    )
    if select_idxs is not None:
        tss_imgs_us = tss_imgs_us[select_idxs]
        img_paths = [img_paths[i] for i in select_idxs]
    from enerf_tpu.data.provider import read_image
    images = np.stack(
        [read_image(p, out_dim_color, downscale) for p in img_paths])
    H, W = images.shape[1:3]
    if downscale > 1:
        # frame-camera intrinsics follow the image resize (events keep the
        # full event-camera resolution, matching the reference)
        intr = {k: (v / downscale if k in ("fx", "fy", "cx", "cy") else v)
                for k, v in intr.items()}

    # mocap poses -> event-camera c2w (provider.py:856-860)
    mocap_files = [f for f in glob.glob(os.path.join(datadir, "*mocap*.txt"))
                   if "pp_mocap" not in f]
    quatlist = np.loadtxt(mocap_files[0], skiprows=1)
    assert quatlist.shape[1] == 8
    hf_ts_us = quatlist[:, 0]
    rots = Rot.from_quat(quatlist[:, 4:8]).as_matrix()
    T_w_marker = get_hom_trafos(rots, quatlist[:, 1:4])

    def cam_chain(T_imu_x):
        return np.einsum(
            "nij,jk->nik", T_w_marker,
            np.linalg.inv(T_imu_marker) @ T_imu_x,
        )

    if pp_poses_sphere:
        # spherification runs in the frame-camera system then maps over
        hf_rgb = preprocess_pose_array_sphere(cam_chain(T_imu_cam))
        T_rgb_ev = np.linalg.inv(T_imu_cam) @ T_imu_evcam
        hf_ev = np.einsum("nij,jk->nik", hf_rgb, T_rgb_ev)
        to_final = lambda p: nerf_matrix_to_ngp(p, scale=scale)
    else:
        hf_rgb = cam_chain(T_imu_cam)
        hf_ev = cam_chain(T_imu_evcam)
        to_final = lambda p: nerf_matrix_to_ngp(rub_from_rdf(p[None])[0], scale=scale)

    hf_poses_ev = np.stack([to_final(p) for p in hf_ev])
    interp_rgb = make_pose_interpolator(hf_ts_us, hf_rgb)
    img_poses = np.stack(
        [to_final(np.vstack([p, [0, 0, 0, 1]]))
         for p in interp_rgb(np.clip(tss_imgs_us, hf_ts_us[0], hf_ts_us[-1]))]
    )

    # events
    evs_h5_path = glob.glob(os.path.join(datadir, f"*events_{suffix}.h5"))[0]
    rmap_path = glob.glob(os.path.join(datadir, f"*rectify_map_{cam}.h5"))
    rectify_map = None
    if rmap_path:
        with h5py.File(rmap_path[0], "r") as f:
            rectify_map = np.asarray(f["rectify_map"])
    with h5py.File(evs_h5_path, "r") as f:
        slicer = EventSlicer(f)
        events, frame_ids = slice_events_per_frame(slicer, tss_imgs_us, rectify_map)

    return {
        "images": images,
        "tss_imgs_ns": tss_imgs_us * 1000.0,
        "poses": img_poses,
        "intrinsics": (intr["fx"], intr["fy"], intr["cx"], intr["cy"]),
        "intrinsics_evs": (intr_evs["fx"], intr_evs["fy"], intr_evs["cx"], intr_evs["cy"]),
        "hf_ts": hf_ts_us * 1000.0,
        "hf_poses": hf_poses_ev,
        "events": events,
        "event_frame_ids": frame_ids,
        "H": H,
        "W": W,
        "H_ev": 720,
        "W_ev": 1280,
    }


def save_tumvie_dataset(data, datadir, scale=0.33):
    """Write a synthetic dataset in the TUM-VIE on-disk layout (fixture +
    format documentation): left_images_undistorted/ + timestamps, mocap
    quatlist, calib_undist.json + mocap-imu-calib.json (identity
    extrinsics), events_left.h5 (us + ms_to_idx), identity rectify map."""
    import json as _json
    from scipy.spatial.transform import Rotation as Rot
    from enerf_tpu.data.h5events import write_event_h5, write_rectify_map
    from enerf_tpu.data.provider import raw_rdf_from_ngp

    H, W = data["H"], data["W"]
    imgdir = os.path.join(datadir, "left_images_undistorted")
    os.makedirs(imgdir, exist_ok=True)
    ts_us = data["frame_ts"] * 1e6
    np.savetxt(os.path.join(imgdir, "image_timestamps_left.txt"), ts_us)
    for i, im in enumerate(data["frames"]):
        img8 = (np.clip(im[..., 0], 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(imgdir, f"{i:05d}.png"), img8)

    # mocap marker poses == camera poses (identity marker/imu/cam calib)
    hf_t = np.linspace(data["frame_ts"][0], data["frame_ts"][-1], 4 * len(ts_us))
    rows = []
    for t in hf_t:
        raw = raw_rdf_from_ngp(data["pose_fn"](t), scale)
        q = Rot.from_matrix(raw[:3, :3]).as_quat()
        rows.append([t * 1e6, *raw[:3, 3], *q])
    np.savetxt(os.path.join(datadir, "mocap_data.txt"), np.asarray(rows),
               header="ts_us px py pz qx qy qz qw")

    ident = {"px": 0.0, "py": 0.0, "pz": 0.0,
             "qx": 0.0, "qy": 0.0, "qz": 0.0, "qw": 1.0}
    fx, fy, cx, cy = data["intrinsics"]
    intr = {"fx": fx, "fy": fy, "cx": cx, "cy": cy}
    with open(os.path.join(datadir, "calib_undist.json"), "w") as f:
        _json.dump({"value0": {
            "intrinsics_undistorted": [intr, intr, intr, intr],
            "T_imu_cam": [ident, ident, ident, ident],
        }}, f)
    with open(os.path.join(datadir, "mocap-imu-calib.json"), "w") as f:
        _json.dump({"value0": {"T_imu_marker": ident}}, f)

    ev = data["events"]
    order = np.argsort(ev[:, 2], kind="stable")
    ev = ev[order]
    write_event_h5(
        os.path.join(datadir, "events_left.h5"),
        ev[:, 0], ev[:, 1], ev[:, 2] * 1e6, (ev[:, 3] > 0).astype(np.int8),
        grouped=True,
    )
    rmap = np.stack(
        np.meshgrid(np.arange(W), np.arange(H), indexing="xy"), -1
    ).astype(np.float32)
    write_rectify_map(os.path.join(datadir, "rectify_map_left.h5"), rmap)
    return datadir
