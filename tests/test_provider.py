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
