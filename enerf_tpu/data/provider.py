"""Dataset providers: esim event datasets + frame datasets, device-resident.

Parity: reference nerf/provider.py —
  - esim mode (provider.py:486-504, 720-768): GT pose quatlist (*poses_all*.txt,
    rows [ts_ns, px, py, pz, qx, qy, qz, qw], c2w in rdf), slerp+cubic at
    image timestamps, optional sphere preprocessing, rub conversion +
    nerf_matrix_to_ngp(scale) into the final camera frame; events as
    per-interval events/*.npy arrays (x, y, ts_ns, pol); images +
    image_stamps_ns.txt
  - NeRFDataset collate (provider.py:1057-1104): sample num_rays pixels,
    gather gt pixels (grayscale when out_dim_color == 1)
  - EventNeRFDataset (provider.py:1106-1507): per-pixel chains, pose per
    event, successor / accumulation sampling, paired event rays

TPU design: all preprocessing happens once on the host (vectorized numpy +
scipy); training-time sampling is pure jnp on device (data/events.py,
data/rays.py), so a train step never touches the host.  `save_esim_dataset`
writes the synthetic simulator's output in the exact reference on-disk
format, which round-trips through this loader in the tests.
"""

import functools
import glob
import json
import os

import numpy as np
import cv2
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from enerf_tpu.data import synthetic
from enerf_tpu.data.events import build_event_chains, sample_event_batch
from enerf_tpu.data.poses import (
    make_pose_interpolator, nerf_matrix_to_ngp, get_hom_trafos,
    mat_to_quat_np, interp_pose_device,
)
from enerf_tpu.data.rays import get_rays_sampled, get_event_rays


# ----------------------------------------------------------------------------
# pose convention helpers (reference pose_utils.py:250-262, 664-676)


def rub_from_rdf(poses):
    """[N, 3or4, >=4]: negate the y and z basis columns (involution)."""
    p = np.array(poses, np.float64, copy=True)
    p[:, :3, 1] *= -1
    p[:, :3, 2] *= -1
    return p


def ngp_from_raw_rdf(pose_rdf, scale):
    """Full esim chain: raw rdf c2w -> rub -> nerf_matrix_to_ngp."""
    rub = rub_from_rdf(pose_rdf[None])[0]
    return nerf_matrix_to_ngp(rub, scale=scale)


def raw_rdf_from_ngp(pose_ngp, scale):
    """Inverse of ngp_from_raw_rdf (used by the dataset writer)."""
    p = np.asarray(pose_ngp, np.float64)
    rub = np.eye(4)
    # invert nerf_matrix_to_ngp: rows (1,2,0) of rub gave ngp rows (0,1,2)
    rub[1, 0], rub[1, 1], rub[1, 2], rub[1, 3] = p[0, 0], -p[0, 1], -p[0, 2], p[0, 3] / scale
    rub[2, 0], rub[2, 1], rub[2, 2], rub[2, 3] = p[1, 0], -p[1, 1], -p[1, 2], p[1, 3] / scale
    rub[0, 0], rub[0, 1], rub[0, 2], rub[0, 3] = p[2, 0], -p[2, 1], -p[2, 2], p[2, 3] / scale
    return rub_from_rdf(rub[None])[0]


# ----------------------------------------------------------------------------
# esim on-disk format: loader + writer


def resolve_image_dir(datadir, mode, e2vid=0, images_corrupted=False,
                      default_dir=None):
    """Image-source switching (reference provider.py:487-545, 731-735).

    --e2vid N selects E2VID reconstructions (e2vids/e2vid_upN_*/e2calib*/);
    images_corrupted selects the images_corrupted/ folder (training only).
    Returns (dir, kind) with kind in {'clean', 'e2vid', 'corrupted'}.
    """
    if e2vid:
        pats = {
            "esim": f"e2vids/e2vid_up{e2vid}_*/e2calib/",
            "eds": f"e2vids/left/e2vid_up{e2vid}_*/e2calib_undistorted/",
            "tumvie": f"e2vids/e2vid_up{e2vid}_*/e2calib_undistorted/",
        }
        pat = pats.get(mode, pats["esim"])
        hits = sorted(glob.glob(os.path.join(datadir, pat)))
        assert hits, (
            f"--e2vid {e2vid}: no reconstruction dir matching {pat} "
            f"under {datadir}"
        )
        return hits[0], "e2vid"
    if images_corrupted:
        d = os.path.join(datadir, "images_corrupted")
        assert os.path.isdir(d), f"images_corrupted=1 but {d} is missing"
        return d, "corrupted"
    return default_dir, "clean"


def read_image(path, out_dim_color, downscale=1):
    """Read one image -> [H, W, C] float32 in [0, 1] (shared by the esim /
    tumvie / eds loaders so downscale semantics stay identical)."""
    im = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if im.ndim == 3:
        im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
    else:
        im = im[..., None].repeat(3, -1)
    if downscale > 1:
        im = cv2.resize(im, (im.shape[1] // downscale, im.shape[0] // downscale),
                        interpolation=cv2.INTER_AREA)
    im = im.astype(np.float32) / 255.0
    if out_dim_color == 1:
        im = (im @ np.asarray([0.299, 0.587, 0.114], np.float32))[..., None]
    return im


def _load_image_stack(imgdir, out_dim_color, downscale, expect=None):
    """Read sorted png/jpg stack -> [F, H, W, C] float32 in [0, 1]."""
    img_paths = sorted(
        glob.glob(os.path.join(imgdir, "*.png"))
        + glob.glob(os.path.join(imgdir, "*.jpg"))
    )
    assert img_paths, f"no images in {imgdir}"
    if expect is not None:
        assert len(img_paths) == expect, (
            f"{imgdir}: {len(img_paths)} images but {expect} timestamps — "
            "the alternate image source must align with the frame stamps"
        )
    return np.stack([read_image(p, out_dim_color, downscale)
                     for p in img_paths])


def load_esim_dataset(datadir, scale=0.33, out_dim_color=1, downscale=1,
                      e2vid=0, images_corrupted=False):
    """Load an esim-format dataset directory.

    Returns dict(images [F, H, W, C] float32 in [0,1], tss_imgs_ns [F],
    poses [F, 4, 4] (final ngp frame), intrinsics (fx, fy, cx, cy),
    hf_ts [K], hf_poses [K, 4, 4] (final frame), events [M, 4]
    (x, y, ts_ns, pol), event_frame_ids [M]).  With e2vid, `images` are the
    E2VID reconstructions (the reference also evaluates against them,
    provider.py:1093-1095); with images_corrupted a separate
    `train_images` array is returned and `images` stay clean (reference
    :734-735 uses the corrupted folder only for training).
    """
    # GT pose list
    pose_files = glob.glob(os.path.join(datadir, "*poses_all*.txt"))
    assert pose_files, f"no *poses_all*.txt in {datadir}"
    quatlist = np.loadtxt(pose_files[0], skiprows=1)
    assert quatlist.shape[1] == 8
    hf_ts = quatlist[:, 0]
    rots = R.from_quat(quatlist[:, 4:8]).as_matrix()
    hf_raw = get_hom_trafos(rots, quatlist[:, 1:4])  # c2w rdf

    # images (image-source switching: clean / e2vid / corrupted)
    clean_dir = os.path.join(datadir, "images")
    tss_imgs_ns = np.loadtxt(os.path.join(clean_dir, "image_stamps_ns.txt"))
    imgdir, kind = resolve_image_dir(datadir, "esim", e2vid, images_corrupted,
                                     default_dir=clean_dir)
    train_images = None
    if kind == "e2vid":
        images = _load_image_stack(imgdir, out_dim_color, downscale,
                                   expect=len(tss_imgs_ns))
    elif kind == "corrupted":
        images = _load_image_stack(clean_dir, out_dim_color, downscale,
                                   expect=len(tss_imgs_ns))
        train_images = _load_image_stack(imgdir, out_dim_color, downscale,
                                         expect=len(tss_imgs_ns))
    else:
        images = _load_image_stack(clean_dir, out_dim_color, downscale,
                                   expect=len(tss_imgs_ns))
    H, W = images.shape[1:3]

    # intrinsics from poses_bounds hwf (reference load_intrinsics)
    pb = np.load(os.path.join(datadir, "poses_bounds.npy"))
    hwf = pb[0, :15].reshape(3, 5)[:, 4]
    focal = hwf[2] / downscale
    intrinsics = (focal, focal, W / 2.0, H / 2.0)

    # interpolate raw poses at image times, then convert to the final frame
    interp = make_pose_interpolator(hf_ts, hf_raw)
    img_raw = interp(np.clip(tss_imgs_ns, hf_ts[0], hf_ts[-1]))  # [F, 3, 4] rdf
    img_hom = get_hom_trafos(img_raw[:, :3, :3], img_raw[:, :3, 3])
    poses = np.stack([ngp_from_raw_rdf(p, scale) for p in img_hom])

    hf_final = np.stack([ngp_from_raw_rdf(p, scale) for p in hf_raw])

    # events
    eventdir = os.path.join(datadir, "events")
    ev_files = sorted(glob.glob(os.path.join(eventdir, "*.npy")))
    events, frame_ids = [], []
    for fid, f in enumerate(ev_files):
        ev = np.load(f)[:, :4]
        events.append(ev)
        frame_ids.append(np.full(ev.shape[0], fid, np.int64))
    events = np.concatenate(events) if events else np.zeros((0, 4))
    frame_ids = np.concatenate(frame_ids) if frame_ids else np.zeros((0,), np.int64)
    # polarity to +-1 (reference transform_pol)
    if events.shape[0] and set(np.unique(events[:, 3])) <= {0.0, 1.0}:
        events[:, 3] = events[:, 3] * 2.0 - 1.0

    out = {
        "images": images,
        "tss_imgs_ns": tss_imgs_ns,
        "poses": poses,
        "intrinsics": intrinsics,
        "hf_ts": hf_ts,
        "hf_poses": hf_final,
        "events": events,
        "event_frame_ids": frame_ids,
        "H": H,
        "W": W,
    }
    if train_images is not None:
        out["train_images"] = train_images
    return out


# Per-scene pose nudges the reference hardcodes after loading (provider.py
# :611-618, update_poses :705-718): translation offsets in the final ngp
# frame, applied to both keyframe and high-frequency poses.
_SCENE_POSE_OFFSETS = {
    "11_all_characters": (-1.5, -0.5, -0.75),
    "00_peanuts_dark": (-1.0, -0.5, -1.0),  # skipped when pp_poses_sphere
    "ShakeCarpet1": (0.0, 0.0, 0.3),
}


def apply_scene_pose_offset(datadir, data, pp_poses_sphere=False):
    """Apply the reference's dataset-specific pose offset in place.

    Matches reference provider.py:611-618: keyed on the scene directory
    name; peanuts_dark only when the sphere preprocessing is off.
    """
    name = os.path.basename(os.path.normpath(datadir or ""))
    off = None
    for key, xyz in _SCENE_POSE_OFFSETS.items():
        if key in name:
            off = xyz
            break
    if off is None or (name.startswith("00_peanuts_dark") and pp_poses_sphere):
        return data
    for field in ("poses", "hf_poses"):
        if field in data and data[field] is not None and len(data[field]):
            data[field][:, :3, 3] += np.asarray(off)
    return data


def write_transforms_json(workspace, data, split="train"):
    """Write the reference's workspace transforms artifact (provider.py
    :869-965 create_transform_json_from_posesBds): intrinsics + per-frame
    c2w matrices, for reproducibility/interchange with reference tooling.
    """
    fx, fy, cx, cy = [float(v) for v in data["intrinsics"]]
    H, W = int(data["H"]), int(data["W"])
    H_ev = int(data.get("H_ev", H))
    W_ev = int(data.get("W_ev", W))
    iev = data.get("intrinsics_evs", data["intrinsics"])
    out = {
        "camera_angle_x": float(2 * np.arctan(W / (2 * fx))),
        "camera_angle_y": float(2 * np.arctan(H / (2 * fy))),
        "fl_x": fx, "fl_y": fy,
        "k1": 0, "k2": 0, "p1": 0, "p2": 0,
        "cx": cx, "cy": cy, "w": W, "h": H,
        "h_evs": H_ev, "w_evs": W_ev,
        "fl_x_evs": float(iev[0]), "fl_y_evs": float(iev[1]),
        "cx_evs": float(iev[2]), "cy_evs": float(iev[3]),
        "frames": [
            {
                "file_path": f"images/{i:06d}.png",
                "ts_ns": float(data["tss_imgs_ns"][i])
                if "tss_imgs_ns" in data else None,
                "transform_matrix": np.asarray(p)[:4, :4].tolist(),
            }
            for i, p in enumerate(data["poses"])
        ],
    }
    os.makedirs(workspace, exist_ok=True)
    path = os.path.join(workspace, f"transform_{split}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    return path


def save_esim_dataset(data, datadir, scale=0.33):
    """Write a synthetic dataset (data/synthetic.simulate_events output) in
    the reference esim on-disk format."""
    os.makedirs(os.path.join(datadir, "images"), exist_ok=True)
    os.makedirs(os.path.join(datadir, "events"), exist_ok=True)

    H, W = data["H"], data["W"]
    fx = data["intrinsics"][0]
    ts_ns = data["frame_ts"] * 1e9

    # images + stamps
    np.savetxt(os.path.join(datadir, "images", "image_stamps_ns.txt"), ts_ns)
    for i, im in enumerate(data["frames"]):
        img8 = (np.clip(im[..., 0], 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(datadir, "images", f"{i:06d}.png"), img8)

    # raw pose quatlist: invert the ngp chain (+ dense time sampling)
    hf_t = np.linspace(data["frame_ts"][0], data["frame_ts"][-1], 4 * len(ts_ns))
    rows = []
    for t in hf_t:
        raw = raw_rdf_from_ngp(data["pose_fn"](t), scale)
        q = R.from_matrix(raw[:3, :3]).as_quat()
        rows.append([t * 1e9, *raw[:3, 3], *q])
    np.savetxt(
        os.path.join(datadir, "poses_all.txt"), np.asarray(rows),
        header="ts_ns px py pz qx qy qz qw",
    )

    # poses_bounds.npy (only hwf is consumed by the loader)
    pb = np.zeros((max(len(ts_ns), 11), 17))
    base = np.eye(3, 5)
    base[:, 4] = (H, W, fx)
    pb[:, :15] = base.ravel()
    np.save(os.path.join(datadir, "poses_bounds.npy"), pb)

    # events per inter-frame interval
    ev = data["events"]
    for fid in range(len(ts_ns) - 1):
        t0, t1 = data["frame_ts"][fid], data["frame_ts"][fid + 1]
        m = (ev[:, 2] >= t0) & (ev[:, 2] < t1) if fid < len(ts_ns) - 2 else (
            (ev[:, 2] >= t0) & (ev[:, 2] <= t1)
        )
        chunk = ev[m].copy()
        chunk[:, 2] *= 1e9  # seconds -> ns
        np.save(os.path.join(datadir, "events", f"{fid:06d}.npy"), chunk)
    return datadir


# ----------------------------------------------------------------------------
# providers (the protocol consumed by train/trainer.py)


# ----------------------------------------------------------------------------
# Jitted per-step batch samplers.
#
# Sampling must be ONE compiled program, not eager jnp: every eager primitive
# is a separate device dispatch, and through the remote-TPU tunnel each
# dispatch costs a round-trip — the round-1 eager samplers (~100 primitives
# per event batch) made real training ~16x slower than the benched train
# step.  Arrays are passed explicitly (not closed over) so they stay runtime
# parameters instead of being baked into the HLO as constants.


@functools.partial(jax.jit, static_argnames=("num_rays", "H", "W", "use_emap"))
def _frames_sample_jit(key, poses, images, error_map, intrinsics,
                       *, num_rays, H, W, use_emap):
    k1, k2 = jax.random.split(key)
    fi = jax.random.randint(k1, (), 0, poses.shape[0])
    emap = error_map[fi] if use_emap else None
    rays = get_rays_sampled(k2, poses[fi], intrinsics, H, W, num_rays,
                            error_map=emap)
    batch = {
        "rays_o": rays["rays_o"],
        "rays_d": rays["rays_d"],
        "images": images[fi][rays["inds"]],
    }
    return batch, fi, rays.get("inds_coarse")


@jax.jit
def _errmap_update_jit(error_map, fi, inds, per_ray_loss):
    old = error_map[fi, inds]
    return error_map.at[fi, inds].set(0.1 * old + 0.9 * per_ray_loss)


@functools.partial(jax.jit, static_argnames=(
    "batch_size_evs", "accumulate", "acc_max_num_evs", "n_frames",
    "use_no_ev", "has_frames", "num_rays", "frame_H", "frame_W",
    "precomputed"))
def _event_sample_jit(key, arrs, *, batch_size_evs, accumulate,
                      acc_max_num_evs, n_frames, use_no_ev, has_frames,
                      num_rays, frame_H, frame_W, precomputed):
    """One-dispatch event batch: sample (event, successor) pairs, gather or
    slerp their poses, build paired rays, plus optional no-event pairs and
    an optional GT-frame ray batch (reference collate provider.py:1363-1499).
    """
    chains = arrs["chains"]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    frame = jax.random.randint(k1, (), 0, n_frames)
    samp = sample_event_batch(
        k2, chains, frame, batch_size_evs,
        accumulate=accumulate, acc_max_num_evs=acc_max_num_evs,
    )

    def ev_poses(idx):
        if precomputed:
            return arrs["poses_evs"][idx]
        return interp_pose_device(
            arrs["key_ts"], arrs["key_quats"], arrs["key_trans"],
            chains.ts[idx])

    xs = chains.xs[samp["idx_start"]]
    ys = chains.ys[samp["idx_start"]]
    rays = get_event_rays(
        xs, ys, ev_poses(samp["idx_start"]), ev_poses(samp["idx_end"]),
        arrs["intrinsics_evs"],
    )
    batch = dict(rays, pols=samp["pols"])
    if use_no_ev:
        k5, k6, k7 = jax.random.split(jax.random.fold_in(key, 7), 3)
        j = jax.random.randint(k5, (), 0, arrs["noev_coords"].shape[0])
        n_no = batch_size_evs // 2
        sel = jax.random.randint(
            k6, (n_no,), 0, jnp.maximum(arrs["noev_count"][j], 1))
        xyno = arrs["noev_coords"][j][sel]  # [n_no, 2]
        tt = jax.random.uniform(
            k7, (n_no, 2), minval=arrs["noev_t0"][j], maxval=arrs["noev_t1"][j])
        tt = jnp.sort(tt, axis=1)
        p1 = interp_pose_device(
            arrs["key_ts"], arrs["key_quats"], arrs["key_trans"], tt[:, 0])
        p2 = interp_pose_device(
            arrs["key_ts"], arrs["key_quats"], arrs["key_trans"], tt[:, 1])
        nrays = get_event_rays(
            xyno[:, 0], xyno[:, 1], p1, p2, arrs["intrinsics_evs"],
        )
        batch["rays_no_evs_o1"] = nrays["rays_evs_o1"]
        batch["rays_no_evs_d1"] = nrays["rays_evs_d1"]
        batch["rays_no_evs_o2"] = nrays["rays_evs_o2"]
        batch["rays_no_evs_d2"] = nrays["rays_evs_d2"]
    if has_frames:
        fi = jax.random.randint(k3, (), 0, arrs["frame_poses"].shape[0])
        frays = get_rays_sampled(
            k4, arrs["frame_poses"][fi], arrs["intrinsics"],
            frame_H, frame_W, num_rays,
        )
        batch["rays_o"] = frays["rays_o"]
        batch["rays_d"] = frays["rays_d"]
        batch["images"] = arrs["frames"][fi][frays["inds"]]
    return batch


class FramesProvider:
    """Frame-supervision provider (reference NeRFDataset), with optional
    error-map-weighted pixel sampling (utils.py:134-156, 611-632)."""

    def __init__(self, images, poses, intrinsics, num_rays=4096,
                 steps_per_epoch=100, error_map=False, stereo_views=None,
                 rand_pose=-1, rand_radius=2.5):
        # stereo_views: optional list of event-camera view dicts rendered at
        # eval time alongside the frame views (reference provider.py:1087-1091)
        self.stereo_views = stereo_views
        # rand_pose semantics (reference main_nerf.py:183, wired here unlike
        # the reference): <0 never, ==0 always, >0 one rand-pose batch every
        # rand_pose GT batches.  Rand batches carry a full side*side pixel
        # grid so the trainer can score the rendered image semantically.
        self.rand_pose = int(rand_pose)
        self.rand_radius = float(rand_radius)
        self._batch_i = 0
        self.images = jnp.asarray(images.reshape(images.shape[0], -1, images.shape[-1]))
        self.poses = jnp.asarray(poses, jnp.float32)
        self.train_poses = np.asarray(poses)
        self.intrinsics = intrinsics
        self.H, self.W = images.shape[1:3]
        self.num_rays = num_rays
        self.steps_per_epoch = steps_per_epoch
        self._images_np = images
        self.error_map = (
            jnp.ones((images.shape[0], 128 * 128)) if error_map else None
        )

    def _rand_pose_batch(self, key):
        """Random orbit pose -> full side*side ray grid (no GT images)."""
        from enerf_tpu.data.rays import get_rays_full

        k1, k2, k3 = jax.random.split(key, 3)
        side = max(int(np.sqrt(self.num_rays)), 8)
        r = self.rand_radius * jax.random.uniform(k1, (), minval=1.0, maxval=1.2)
        theta = jax.random.uniform(k2, (), minval=np.pi / 6, maxval=np.pi / 2)
        phi = jax.random.uniform(k3, (), minval=0.0, maxval=2 * np.pi)
        eye = jnp.stack([r * jnp.sin(theta) * jnp.cos(phi),
                         r * jnp.sin(theta) * jnp.sin(phi),
                         r * jnp.cos(theta)])
        # look-at with rdf axes (synthetic.look_at_pose, device-side)
        f = -eye / jnp.linalg.norm(eye)
        up = jnp.asarray([0.0, 0.0, 1.0])
        rt = jnp.cross(f, up)
        rt = rt / jnp.linalg.norm(rt)
        d = jnp.cross(f, rt)
        pose = jnp.eye(4)
        pose = pose.at[:3, 0].set(rt).at[:3, 1].set(d).at[:3, 2].set(f).at[:3, 3].set(eye)
        fx = side / (2.0 * np.tan(np.radians(30.0)))
        ro, rd = get_rays_full(pose, (fx, fx, side / 2.0, side / 2.0), side, side)
        return {"rays_o": ro, "rays_d": rd, "rand_pose_side": side}

    def train_step_batch(self, key):
        self._batch_i += 1
        if self.rand_pose == 0 or (
            self.rand_pose > 0 and self._batch_i % (self.rand_pose + 1) == 0
        ):
            return self._rand_pose_batch(jax.random.fold_in(key, 99))
        batch, fi, inds_coarse = _frames_sample_jit(
            key, self.poses, self.images, self.error_map, self.intrinsics,
            num_rays=self.num_rays, H=self.H, W=self.W,
            use_emap=self.error_map is not None,
        )
        if self.error_map is not None:
            self._last_fi = fi
            self._last_inds_coarse = inds_coarse
        return batch

    def update_error_map(self, per_ray_loss):
        """EMA update at the last sampled coarse indices (utils.py:625-632)."""
        if self.error_map is None:
            return
        self.error_map = _errmap_update_jit(
            self.error_map, self._last_fi, self._last_inds_coarse, per_ray_loss
        )

    def sampler_bundle(self):
        """(arrays, statics) for the fused multi-step loop (train/chunk.py);
        the arrays feed _frames_sample_jit inside the scan body."""
        arrs = {"poses": self.poses, "images": self.images,
                "intrinsics": self.intrinsics}
        statics = dict(num_rays=self.num_rays, H=self.H, W=self.W,
                       use_emap=self.error_map is not None)
        return arrs, statics

    def _views(self, idxs):
        return [
            {
                "pose": np.asarray(self.poses[i]),
                "intrinsics": self.intrinsics,
                "H": self.H,
                "W": self.W,
                "gt": self._images_np[i],
            }
            for i in idxs
        ]

    def val_views(self):
        return self._views(range(len(self._images_np)))

    def test_views(self):
        return self._views(range(len(self._images_np)))


class EventProvider:
    """Event-supervision provider (reference EventNeRFDataset).

    Builds per-pixel chains + per-event poses once on the host; batch
    sampling runs on device.
    """

    def __init__(self, events, hf_ts, hf_poses, intrinsics, H, W,
                 batch_size_evs=4096, accumulate_evs=False, acc_max_num_evs=0,
                 frames=None, frame_poses=None, num_rays=4096,
                 event_frame_ids=None, n_frames=1, steps_per_epoch=100,
                 precompute_evs_poses=True, intrinsics_evs=None,
                 negative_event_sampling=False, noev_chunk_frac=0.05):
        self.chains, ev_ts_sorted = build_event_chains(
            events, event_frame_ids, n_frames
        )
        # pose keyframes as device (quat, trans) pairs for online per-event /
        # per-no-event-sample interpolation (reference provider.py:1410-1420's
        # precompute_evs_poses=0 option, done with slerp ON DEVICE here)
        hf_poses_np = np.asarray(hf_poses, np.float64)
        self.key_ts = jnp.asarray(np.asarray(hf_ts, np.float64), jnp.float32)
        self.key_quats = jnp.asarray(
            mat_to_quat_np(hf_poses_np[:, :3, :3]), jnp.float32)
        self.key_trans = jnp.asarray(hf_poses_np[:, :3, 3], jnp.float32)

        self._interp = make_pose_interpolator(hf_ts, hf_poses)
        self.precompute_evs_poses = bool(precompute_evs_poses)
        if self.precompute_evs_poses:
            # 48 bytes/event of device memory; exact host Slerp+cubic
            self.poses_evs = jnp.asarray(self._interp(ev_ts_sorted))  # [M, 3, 4]
        else:
            # zero per-event memory: poses are slerped on device per batch
            self.poses_evs = None

        # negative (no-event) sampling: per time chunk, the pixels with no
        # events in that chunk (reference provider.py:1281-1351, 1443-1486).
        # Stored as ONE padded device tensor so sampling is pure jnp — the
        # reference (and round 1 here) did host numpy RNG + scipy slerp per
        # step, a per-step host sync on the training hot path.
        self.noev_coords = None
        if negative_event_sampling and len(events):
            ev = np.asarray(events)
            t0, t1 = float(ev[:, 2].min()), float(ev[:, 2].max())
            n_chunks = max(int(1.0 / noev_chunk_frac), 1)
            edges = np.linspace(t0, t1, n_chunks + 1)
            chunk_of = np.clip(
                np.searchsorted(edges, ev[:, 2], side="right") - 1, 0, n_chunks - 1
            )
            all_pix = np.stack(
                np.meshgrid(np.arange(W), np.arange(H), indexing="xy"), -1
            ).reshape(-1, 2)
            coords_list, counts = [], []
            for j in range(n_chunks):
                m = chunk_of == j
                has = np.zeros(H * W, bool)
                pix = (ev[m, 1].astype(np.int64) * W + ev[m, 0].astype(np.int64))
                has[np.clip(pix, 0, H * W - 1)] = True
                coords_list.append(all_pix[~has].astype(np.float32))
                counts.append(len(coords_list[-1]))
            pmax = max(max(counts), 1)
            pad = np.zeros((n_chunks, pmax, 2), np.float32)
            for j, c in enumerate(coords_list):
                if len(c):
                    reps = -(-pmax // len(c))
                    pad[j] = np.tile(c, (reps, 1))[:pmax]
            self.noev_coords = jnp.asarray(pad)            # [J, Pmax, 2]
            self.noev_count = jnp.asarray(counts, jnp.int32)
            self.noev_t0 = jnp.asarray(edges[:-1], jnp.float32)
            self.noev_t1 = jnp.asarray(edges[1:], jnp.float32)
        self.intrinsics = intrinsics
        # stereo rigs (tumvie/eds): event camera has its own intrinsics
        self.intrinsics_evs = intrinsics_evs or intrinsics
        self.H, self.W = H, W
        self.batch_size_evs = batch_size_evs
        self.accumulate_evs = accumulate_evs
        self.acc_max_num_evs = acc_max_num_evs
        self.n_frames = n_frames
        self.steps_per_epoch = steps_per_epoch
        self.num_rays = num_rays

        self.frames = None
        if frames is not None:
            self.frames = jnp.asarray(frames.reshape(frames.shape[0], -1, frames.shape[-1]))
            self.frame_poses = jnp.asarray(frame_poses, jnp.float32)
            self._frames_np = frames
            self.train_poses = np.asarray(frame_poses)
            # frame camera may differ from the event camera (tumvie rigs)
            self.frame_H, self.frame_W = frames.shape[1:3]

    def _event_poses(self, idx):
        """Poses for flat event indices — precomputed gather or online
        device slerp (precompute_evs_poses=0)."""
        if self.poses_evs is not None:
            return self.poses_evs[idx]
        return interp_pose_device(
            self.key_ts, self.key_quats, self.key_trans, self.chains.ts[idx]
        )

    def _sampler_arrays(self, use_no_ev):
        arrs = {
            "chains": self.chains,
            "intrinsics_evs": self.intrinsics_evs,
            "key_ts": self.key_ts,
            "key_quats": self.key_quats,
            "key_trans": self.key_trans,
        }
        if self.poses_evs is not None:
            arrs["poses_evs"] = self.poses_evs
        if use_no_ev:
            arrs.update(
                noev_coords=self.noev_coords, noev_count=self.noev_count,
                noev_t0=self.noev_t0, noev_t1=self.noev_t1,
            )
        if self.frames is not None:
            arrs.update(
                frames=self.frames, frame_poses=self.frame_poses,
                intrinsics=self.intrinsics,
            )
        return arrs

    def _sampler_statics(self, use_no_ev):
        return dict(
            batch_size_evs=self.batch_size_evs,
            accumulate=self.accumulate_evs,
            acc_max_num_evs=self.acc_max_num_evs,
            n_frames=self.n_frames,
            use_no_ev=use_no_ev,
            has_frames=self.frames is not None,
            num_rays=self.num_rays,
            frame_H=getattr(self, "frame_H", 0),
            frame_W=getattr(self, "frame_W", 0),
            precomputed=self.poses_evs is not None,
        )

    def sampler_bundle(self):
        """(arrays, statics) for the fused multi-step loop (train/chunk.py)."""
        use_no_ev = (self.noev_coords is not None
                     and getattr(self, "use_no_ev", True))
        return self._sampler_arrays(use_no_ev), self._sampler_statics(use_no_ev)

    def train_step_batch(self, key):
        use_no_ev = (self.noev_coords is not None
                     and getattr(self, "use_no_ev", True))
        return _event_sample_jit(
            key, self._sampler_arrays(use_no_ev),
            **self._sampler_statics(use_no_ev),
        )

    def val_views(self):
        if self.frames is None:
            return []
        return [
            {
                "pose": np.asarray(self.frame_poses[i]),
                "intrinsics": self.intrinsics,
                "H": self.frame_H,
                "W": self.frame_W,
                "gt": self._frames_np[i],
            }
            for i in range(len(self._frames_np))
        ]

    def test_views(self):
        return self.val_views()


def _maybe_write_transforms(cfg, data):
    """Best-effort workspace transforms snapshot (reference provider.py:484-496
    writes transform_<ids>_<type>.json on every real-dataset load)."""
    try:
        ws = os.path.join(cfg.outdir, cfg.expweek, cfg.expname)
        write_transforms_json(ws, data, split="train")
    except (OSError, KeyError, ValueError) as e:  # never block training on it
        print(f"[provider] transforms.json snapshot skipped: {e}")


def make_providers(cfg, select_frames=None):
    """Build (train_provider, val_provider) from cfg (reference main_nerf
    dataset dispatch).  esim mode reads cfg.datadir; 'synthetic' generates
    data in-process (used by tests/bench and as a smoke dataset)."""
    if select_frames is None and (cfg.train_idxs or cfg.val_idxs):
        # callers that don't pre-build the reference's select_frames dict
        # still get the config's frame selection (main_nerf.py:14-42 role)
        select_frames = {"train_idxs": cfg.train_idxs,
                         "val_idxs": cfg.val_idxs,
                         "test_idxs": cfg.test_idxs,
                         "exclude_idxs": cfg.exclude_idxs}
    if cfg.mode == "synthetic":
        data = synthetic.simulate_events(
            H=cfg.H, W=cfg.W, C=abs(cfg.C_thres) if cfg.C_thres > 0 else 0.2,
            n_frames=cfg.syn_frames, rich=int(cfg.syn_rich),
        )
        images = data["frames"] if cfg.out_dim_color == 1 else np.repeat(data["frames"], 3, -1)
        sf = select_frames or {}
        va_idx = sf.get("val_idxs") or list(range(len(images)))
        va_idx = [i for i in va_idx if i < len(images)]
        val = FramesProvider(images[va_idx], data["poses"][va_idx],
                             data["intrinsics"], num_rays=cfg.num_rays)
        if cfg.events:
            train = EventProvider(
                data["events"], data["frame_ts"], data["poses"],
                data["intrinsics"], data["H"], data["W"],
                batch_size_evs=cfg.batch_size_evs,
                accumulate_evs=bool(cfg.accumulate_evs),
                acc_max_num_evs=cfg.acc_max_num_evs,
                frames=None if cfg.event_only else images,
                frame_poses=None if cfg.event_only else data["poses"],
                num_rays=cfg.num_rays,
                negative_event_sampling=bool(cfg.negative_event_sampling),
                precompute_evs_poses=bool(cfg.precompute_evs_poses),
            )
        else:
            train = FramesProvider(images, data["poses"], data["intrinsics"],
                                   num_rays=cfg.num_rays,
                                   error_map=bool(cfg.error_map),
                                   rand_pose=cfg.rand_pose,
                                   rand_radius=cfg.radius)
        return train, val

    if cfg.mode == "esim":
        data = load_esim_dataset(
            cfg.datadir, scale=cfg.scale, out_dim_color=cfg.out_dim_color,
            downscale=cfg.downscale, e2vid=cfg.e2vid,
            images_corrupted=bool(cfg.images_corrupted),
        )
        apply_scene_pose_offset(cfg.datadir, data,
                                pp_poses_sphere=bool(cfg.pp_poses_sphere))
        _maybe_write_transforms(cfg, data)
        # images_corrupted trains on the corrupted folder, evals on clean
        # (reference provider.py:734-735); e2vid replaces both (":1093-1095)
        train_imgs = data.get("train_images", data["images"])
        sf = select_frames or {}
        tr_idx = sf.get("train_idxs") or list(range(len(data["images"])))
        va_idx = sf.get("val_idxs") or tr_idx[:1]
        tr_idx = [i for i in tr_idx if i < len(data["images"])]
        va_idx = [i for i in va_idx if i < len(data["images"])]
        val = FramesProvider(
            data["images"][va_idx], data["poses"][va_idx], data["intrinsics"],
            num_rays=cfg.num_rays,
        )
        if cfg.events:
            # events are grouped per file; the reference groups per train
            # frame interval — one global group is equivalent for sampling
            train = EventProvider(
                data["events"], data["hf_ts"], data["hf_poses"],
                data["intrinsics"], data["H"], data["W"],
                batch_size_evs=cfg.batch_size_evs,
                accumulate_evs=bool(cfg.accumulate_evs),
                acc_max_num_evs=cfg.acc_max_num_evs,
                frames=None if cfg.event_only else train_imgs[tr_idx],
                frame_poses=None if cfg.event_only else data["poses"][tr_idx],
                num_rays=cfg.num_rays,
                negative_event_sampling=bool(cfg.negative_event_sampling),
                precompute_evs_poses=bool(cfg.precompute_evs_poses),
            )
        else:
            train = FramesProvider(
                train_imgs[tr_idx], data["poses"][tr_idx],
                data["intrinsics"], num_rays=cfg.num_rays,
                error_map=bool(cfg.error_map),
                rand_pose=cfg.rand_pose, rand_radius=cfg.radius,
            )
        return train, val

    if cfg.mode in ("tumvie", "eds"):
        if cfg.mode == "tumvie":
            from enerf_tpu.data.tumvie import load_tumvie_dataset
            data = load_tumvie_dataset(
                cfg.datadir, e2vid=cfg.e2vid,
                images_corrupted=bool(cfg.images_corrupted),
                scale=cfg.scale, out_dim_color=cfg.out_dim_color,
                downscale=cfg.downscale,
                pp_poses_sphere=bool(cfg.pp_poses_sphere),
                hotpixs=bool(cfg.hotpixs),
                select_idxs=(select_frames or {}).get("train_idxs"),
            )
        else:
            from enerf_tpu.data.eds import load_eds_dataset
            data = load_eds_dataset(
                cfg.datadir, e2vid=cfg.e2vid,
                images_corrupted=bool(cfg.images_corrupted),
                scale=cfg.scale, out_dim_color=cfg.out_dim_color,
                downscale=cfg.downscale, hotpixs=bool(cfg.hotpixs),
                select_idxs=(select_frames or {}).get("train_idxs"),
            )
        apply_scene_pose_offset(cfg.datadir, data,
                                pp_poses_sphere=bool(cfg.pp_poses_sphere))
        _maybe_write_transforms(cfg, data)
        # val split honors val_idxs (reference get_frames selection,
        # main_nerf.py:14-42) — previously the tumvie/eds val provider
        # evaluated ALL loaded frames, which at 120 views made full eval
        # passes (view + stereo view each) prohibitively slow
        va_idx = (select_frames or {}).get("val_idxs") or list(
            range(len(data["images"])))
        va_idx = [i for i in va_idx if i < len(data["images"])]
        stereo = None
        if cfg.eval_stereo_views:
            # event-camera views at the val image timestamps
            interp_ev = make_pose_interpolator(data["hf_ts"], data["hf_poses"])
            ev_poses = interp_ev(data["tss_imgs_ns"][va_idx])
            stereo = [
                {"pose": np.vstack([p, [0, 0, 0, 1]]),
                 "intrinsics": data["intrinsics_evs"],
                 "H": data["H_ev"], "W": data["W_ev"], "gt": None}
                for p in ev_poses
            ]
        val = FramesProvider(
            data["images"][va_idx], data["poses"][va_idx],
            data["intrinsics"], num_rays=cfg.num_rays, stereo_views=stereo,
        )
        if cfg.events:
            train = EventProvider(
                data["events"], data["hf_ts"], data["hf_poses"],
                data["intrinsics"], data["H_ev"], data["W_ev"],
                batch_size_evs=cfg.batch_size_evs,
                accumulate_evs=bool(cfg.accumulate_evs),
                acc_max_num_evs=cfg.acc_max_num_evs,
                frames=None if cfg.event_only else data["images"],
                frame_poses=None if cfg.event_only else data["poses"],
                num_rays=cfg.num_rays,
                event_frame_ids=data["event_frame_ids"],
                n_frames=int(data["event_frame_ids"].max()) + 1
                if len(data["event_frame_ids"]) else 1,
                intrinsics_evs=data["intrinsics_evs"],
                negative_event_sampling=bool(cfg.negative_event_sampling),
                precompute_evs_poses=bool(cfg.precompute_evs_poses),
            )
        else:
            train = FramesProvider(
                data["images"], data["poses"], data["intrinsics"],
                num_rays=cfg.num_rays,
            )
        return train, val

    raise NotImplementedError(f"unknown dataset mode: {cfg.mode}")
