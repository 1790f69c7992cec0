"""Provider tests: esim on-disk format roundtrip + provider protocol."""

import numpy as np
import jax
import pytest

from enerf_tpu.data import synthetic
from enerf_tpu.data.provider import (
    EventProvider, FramesProvider, load_esim_dataset, save_esim_dataset,
    ngp_from_raw_rdf, raw_rdf_from_ngp,
)


def test_ngp_pose_chain_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        pose = synthetic.circle_pose(rng.uniform())
        raw = raw_rdf_from_ngp(pose, scale=0.33)
        back = ngp_from_raw_rdf(raw, scale=0.33)
        np.testing.assert_allclose(back, pose, atol=1e-10)


def test_esim_roundtrip(tmp_path):
    data = synthetic.simulate_events(H=32, W=32, n_frames=20, C=0.15, turns=0.4)
    d = str(tmp_path / "esim_ds")
    save_esim_dataset(data, d, scale=0.33)

    loaded = load_esim_dataset(d, scale=0.33, out_dim_color=1)
    assert loaded["images"].shape == (20, 32, 32, 1)
    # grayscale pngs quantize to 1/255
    np.testing.assert_allclose(loaded["images"], data["frames"], atol=2 / 255)
    # poses reconstructed through the quatlist + slerp + ngp chain
    np.testing.assert_allclose(loaded["poses"], data["poses"], atol=1e-3)
    # events survive (time converted to ns)
    assert abs(loaded["events"].shape[0] - data["events"].shape[0]) <= 2
    np.testing.assert_allclose(
        sorted(np.unique(loaded["events"][:, 3])), [-1.0, 1.0]
    )
    # hf poses cover the trajectory
    t_mid = 0.5 * (loaded["hf_ts"][0] + loaded["hf_ts"][-1])
    i = np.argmin(np.abs(loaded["hf_ts"] - t_mid))
    expect = data["pose_fn"](loaded["hf_ts"][i] / 1e9)
    np.testing.assert_allclose(loaded["hf_poses"][i], expect, atol=1e-3)


def test_event_provider_batches(tmp_path):
    data = synthetic.simulate_events(H=32, W=32, n_frames=20, C=0.12, turns=0.4)
    prov = EventProvider(
        data["events"], data["frame_ts"], data["poses"], data["intrinsics"],
        32, 32, batch_size_evs=128,
    )
    batch = prov.train_step_batch(jax.random.PRNGKey(0))
    for k in ("rays_evs_o1", "rays_evs_d1", "rays_evs_o2", "rays_evs_d2"):
        assert batch[k].shape == (128, 3)
    assert batch["pols"].shape == (128,)
    # directions unit norm
    n = np.linalg.norm(np.asarray(batch["rays_evs_d1"]), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


def test_frames_provider_batches():
    imgs = np.random.default_rng(0).uniform(size=(3, 16, 16, 3)).astype(np.float32)
    poses = np.stack([synthetic.circle_pose(t) for t in [0.0, 0.1, 0.2]])
    prov = FramesProvider(imgs, poses, synthetic.default_intrinsics(16, 16), num_rays=64)
    b = prov.train_step_batch(jax.random.PRNGKey(1))
    assert b["rays_o"].shape == (64, 3) and b["images"].shape == (64, 3)
    views = prov.val_views()
    assert len(views) == 3 and views[0]["gt"].shape == (16, 16, 3)


def test_scene_pose_offset():
    from enerf_tpu.data.provider import apply_scene_pose_offset

    poses = np.tile(np.eye(4), (3, 1, 1))
    hf = np.tile(np.eye(4), (5, 1, 1))
    data = {"poses": poses.copy(), "hf_poses": hf.copy()}
    # reference provider.py:611-618: scene-keyed translation nudges
    apply_scene_pose_offset("/data/ShakeCarpet1", data)
    np.testing.assert_allclose(data["poses"][:, :3, 3],
                               np.tile([0.0, 0.0, 0.3], (3, 1)))
    np.testing.assert_allclose(data["hf_poses"][:, :3, 3],
                               np.tile([0.0, 0.0, 0.3], (5, 1)))

    data2 = {"poses": poses.copy(), "hf_poses": hf.copy()}
    apply_scene_pose_offset("/x/00_peanuts_dark_someconf", data2,
                            pp_poses_sphere=True)  # sphere pp -> skipped
    np.testing.assert_allclose(data2["poses"][:, :3, 3], 0.0)

    data3 = {"poses": poses.copy(), "hf_poses": hf.copy()}
    apply_scene_pose_offset("/x/unknown_scene", data3)
    np.testing.assert_allclose(data3["poses"][:, :3, 3], 0.0)


def test_write_transforms_json(tmp_path):
    import json as _json
    from enerf_tpu.data.provider import write_transforms_json

    data = synthetic.simulate_events(H=16, W=16, n_frames=4, C=0.2)
    data["tss_imgs_ns"] = data["frame_ts"] * 1e9
    path = write_transforms_json(str(tmp_path), data, split="train")
    with open(path) as f:
        t = _json.load(f)
    assert t["w"] == 16 and t["h"] == 16
    assert len(t["frames"]) == len(data["poses"])
    m = np.asarray(t["frames"][0]["transform_matrix"])
    np.testing.assert_allclose(m, data["poses"][0], atol=1e-12)
    # fov consistent with intrinsics
    fx = data["intrinsics"][0]
    assert abs(t["camera_angle_x"] - 2 * np.arctan(16 / (2 * fx))) < 1e-9
