"""EDS/tumvie format loaders: roundtrip via synthetic fixtures."""

import numpy as np
import h5py
import pytest

from enerf_tpu.data import synthetic
from enerf_tpu.data.eds import load_eds_dataset, save_eds_dataset
from enerf_tpu.data.h5events import EventSlicer, write_event_h5, compute_ms_to_idx
from enerf_tpu.data.tumvie import event_window_centers, slice_events_per_frame


@pytest.fixture(scope="module")
def sim():
    return synthetic.simulate_events(H=32, W=32, n_frames=20, C=0.15, turns=0.4)


def test_eds_roundtrip(sim, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("eds_ds"))
    save_eds_dataset(sim, d, scale=0.33)
    loaded = load_eds_dataset(d, scale=0.33, out_dim_color=1)

    assert loaded["images"].shape == (20, 32, 32, 1)
    np.testing.assert_allclose(loaded["images"], sim["frames"], atol=2 / 255)
    # hf (event-camera) poses are exact through the quatlist chain
    mid = len(loaded["hf_ts"]) // 2
    expect = sim["pose_fn"](loaded["hf_ts"][mid] / 1e9)
    np.testing.assert_allclose(loaded["hf_poses"][mid], expect, atol=1e-3)
    # frame poses include the (near-identity) calib0 extrinsic
    np.testing.assert_allclose(loaded["poses"][0], sim["poses"][0], atol=0.05)
    # events: windows cover the sequence; polarity +-1; t in ns
    assert loaded["events"].shape[0] > 0.9 * sim["events"].shape[0]
    assert set(np.unique(loaded["events"][:, 3])) <= {-1.0, 1.0}
    t = loaded["events"][:, 2]
    assert t.max() <= sim["frame_ts"][-1] * 1e9 * 1.2
    # frame ids monotone-consistent with event times
    fid = loaded["event_frame_ids"]
    assert fid.min() >= 0 and fid.max() < 20


def test_event_slicer_window_semantics(tmp_path):
    # handcrafted stream matching the reference docstring example
    t_us = np.asarray([0, 500, 2100, 5000, 5000, 7100, 7200, 7200, 8100, 9000], np.int64)
    path = str(tmp_path / "ev.h5")
    write_event_h5(path, np.arange(10), np.arange(10), t_us, np.ones(10), t_offset=0)
    with h5py.File(path, "r") as f:
        np.testing.assert_array_equal(
            np.asarray(f["ms_to_idx"]), [0, 2, 2, 3, 3, 3, 5, 5, 8, 9]
        )
        sl = EventSlicer(f)
        ev = sl.get_events(500, 5000)
        np.testing.assert_array_equal(ev["t"], [500, 2100])
        ev = sl.get_events(4999, 7150)
        np.testing.assert_array_equal(ev["t"], [5000, 5000, 7100])


def test_event_slicer_t_offset(tmp_path):
    t_us = np.asarray([100, 200, 300], np.int64)
    path = str(tmp_path / "ev_off.h5")
    write_event_h5(path, [1, 2, 3], [1, 2, 3], t_us, [1, 0, 1], t_offset=1000)
    with h5py.File(path, "r") as f:
        sl = EventSlicer(f)
        assert sl.get_start_time_us() == 1000
        ev = sl.get_events(1100, 1300)  # gps-time query
        np.testing.assert_array_equal(ev["t"], [1100, 1200])


def test_window_centers_and_rectify(sim, tmp_path):
    ts_us = sim["frame_ts"] * 1e6
    centers = event_window_centers(ts_us)
    assert len(centers) == len(ts_us) + 1
    assert centers[0] < ts_us[0] < centers[1]

    # rectify map shifts event coords
    ev = sim["events"]
    order = np.argsort(ev[:, 2], kind="stable")
    ev = ev[order]
    path = str(tmp_path / "ev.h5")
    write_event_h5(path, ev[:, 0], ev[:, 1], ev[:, 2] * 1e6,
                   (ev[:, 3] > 0).astype(np.int8))
    rmap = np.stack(np.meshgrid(np.arange(32), np.arange(32), indexing="xy"), -1).astype(np.float32)
    rmap = rmap + 0.25  # constant undistortion shift
    with h5py.File(path, "r") as f:
        sl = EventSlicer(f)
        out, fids = slice_events_per_frame(sl, ts_us, rmap)
    assert out.shape[0] > 0
    # undistorted coords = original + 0.25: the FRACTIONAL part must be
    # exactly 0.25 (integer-x would also satisfy a mod-0.25 check, which
    # made the old assertion pass even with the rectify map ignored)
    np.testing.assert_allclose(np.unique(np.round(out[:, 0] % 1.0, 3)),
                               [0.25], atol=1e-3)
    np.testing.assert_allclose(np.unique(np.round(out[:, 1] % 1.0, 3)),
                               [0.25], atol=1e-3)


def test_eds_provider_with_stereo_views(sim, tmp_path_factory):
    from enerf_tpu.config import Config
    from enerf_tpu.data.provider import make_providers

    # denser stream: per-frame chain grouping needs >=2 events per pixel
    # within single frame intervals
    dense = synthetic.simulate_events(H=32, W=32, n_frames=12, C=0.04, turns=0.5)
    d = str(tmp_path_factory.mktemp("eds_ds2"))
    save_eds_dataset(dense, d, scale=0.33)
    cfg = Config(
        mode="eds", datadir=d, events=1, event_only=1, out_dim_color=1,
        use_luma=0, pp_poses_sphere=0, eval_stereo_views=1,
        batch_size_evs=64, num_rays=64, C_thres=0.15,
    ).validate()
    train, val = make_providers(cfg)
    assert val.stereo_views and len(val.stereo_views) == 12
    sv = val.stereo_views[0]
    assert sv["pose"].shape == (4, 4) and sv["H"] == 32
    # event batches sample fine from the loaded chains
    import jax
    b = train.train_step_batch(jax.random.PRNGKey(0))
    assert b["rays_evs_o1"].shape == (64, 3)


def test_tumvie_roundtrip(sim, tmp_path_factory):
    from enerf_tpu.data.tumvie import load_tumvie_dataset, save_tumvie_dataset

    d = str(tmp_path_factory.mktemp("tumvie_ds"))
    save_tumvie_dataset(sim, d, scale=0.33)
    loaded = load_tumvie_dataset(d, scale=0.33, out_dim_color=1,
                                 pp_poses_sphere=False)
    assert loaded["images"].shape == (20, 32, 32, 1)
    np.testing.assert_allclose(loaded["images"], sim["frames"], atol=2 / 255)
    # identity extrinsics: event-cam hf poses == trajectory poses
    mid = len(loaded["hf_ts"]) // 2
    expect = sim["pose_fn"](loaded["hf_ts"][mid] / 1e9)
    np.testing.assert_allclose(loaded["hf_poses"][mid], expect, atol=1e-3)
    np.testing.assert_allclose(loaded["poses"][0], sim["poses"][0], atol=1e-3)
    # events arrive undistorted (identity map), pol +-1, ns timestamps
    assert loaded["events"].shape[0] > 0.9 * sim["events"].shape[0]
    assert set(np.unique(loaded["events"][:, 3])) <= {-1.0, 1.0}
    assert loaded["W_ev"] == 1280  # tumvie event-camera resolution constant

    # downscale halves images AND frame-camera intrinsics (event camera
    # keeps full resolution); was silently ignored before round 2
    ds = load_tumvie_dataset(d, scale=0.33, out_dim_color=1,
                             pp_poses_sphere=False, downscale=2)
    assert ds["images"].shape == (20, 16, 16, 1)
    np.testing.assert_allclose(
        np.asarray(ds["intrinsics"]),
        np.asarray(loaded["intrinsics"]) / 2.0)
    assert ds["intrinsics_evs"] == loaded["intrinsics_evs"]


def test_tumvie_sphere_preprocessing_path(sim, tmp_path_factory):
    from enerf_tpu.data.tumvie import load_tumvie_dataset, save_tumvie_dataset

    d = str(tmp_path_factory.mktemp("tumvie_ds_pp"))
    save_tumvie_dataset(sim, d, scale=0.33)
    loaded = load_tumvie_dataset(d, scale=0.33, out_dim_color=1,
                                 pp_poses_sphere=True)
    # spherified: camera radii ~1 around the center of attention (x scale)
    radii = np.linalg.norm(loaded["poses"][:, :3, 3], axis=-1)
    assert 0.1 < radii.mean() < 1.2
    R = loaded["poses"][:, :3, :3]
    rrt = R @ np.transpose(R, (0, 2, 1))
    np.testing.assert_allclose(rrt, np.tile(np.eye(3), (len(R), 1, 1)), atol=1e-4)
