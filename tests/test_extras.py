"""Error-map sampling, negative event sampling, tensorboard, CLIP gate."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from enerf_tpu.data import synthetic
from enerf_tpu.data.provider import EventProvider, FramesProvider


def test_error_map_sampling_and_update():
    imgs = np.random.default_rng(0).uniform(size=(2, 16, 16, 3)).astype(np.float32)
    poses = np.stack([synthetic.circle_pose(t) for t in [0.0, 0.2]])
    prov = FramesProvider(imgs, poses, synthetic.default_intrinsics(16, 16),
                          num_rays=64, error_map=True)
    assert prov.error_map.shape == (2, 128 * 128)
    b = prov.train_step_batch(jax.random.PRNGKey(0))
    assert b["rays_o"].shape == (64, 3)
    before = np.asarray(prov.error_map).copy()
    prov.update_error_map(jnp.full((64,), 5.0))
    after = np.asarray(prov.error_map)
    changed = (after != before).sum()
    assert changed > 0
    assert after.max() > before.max()  # high loss raises sampling weight


def test_negative_event_sampling_batches():
    data = synthetic.simulate_events(H=32, W=32, n_frames=20, C=0.12, turns=0.4)
    prov = EventProvider(
        data["events"], data["frame_ts"], data["poses"], data["intrinsics"],
        32, 32, batch_size_evs=64, negative_event_sampling=True,
    )
    assert prov.noev_coords is not None, "no no-event chunks built"
    b = prov.train_step_batch(jax.random.PRNGKey(1))
    for k in ("rays_no_evs_o1", "rays_no_evs_d1", "rays_no_evs_o2", "rays_no_evs_d2"):
        assert k in b and b[k].shape == (32, 3)
    # epoch gating switch
    prov.use_no_ev = False
    b2 = prov.train_step_batch(jax.random.PRNGKey(2))
    assert "rays_no_evs_o1" not in b2


def test_no_event_loss_in_train_step(tmp_path):
    from enerf_tpu.models.field import FieldStatic, init_field_params
    from enerf_tpu.train.state import init_train_state
    from enerf_tpu.train.step import StepStatics, train_step_events

    data = synthetic.simulate_events(H=32, W=32, n_frames=20, C=0.12, turns=0.4)
    prov = EventProvider(
        data["events"], data["frame_ts"], data["poses"], data["intrinsics"],
        32, 32, batch_size_evs=64, negative_event_sampling=True,
    )
    static = FieldStatic(bound=1.0, out_dim_color=1, num_levels=4, log2_hashmap_size=10)
    params = init_field_params(jax.random.PRNGKey(0), static)
    state, opt = init_train_state(params, 1e-2, 100)
    ss = StepStatics(
        field_static=static, num_steps=16, upsample_steps=0, min_near=0.2,
        density_scale=1.0, C_thres=0.12, event_only=True, use_luma=False,
        linlog=True, weight_loss_rgb=1.0, negative_event_sampling=True,
        w_no_ev=1.0, out_dim_color=1,
    )
    b = prov.train_step_batch(jax.random.PRNGKey(1))
    state, aux = train_step_events(state, b, jax.random.PRNGKey(2), ss, opt)
    assert "loss_no_evs" in aux and np.isfinite(float(aux["loss_no_evs"]))


def test_clip_gate():
    from enerf_tpu.train.clip_guidance import clip_available, CLIPLoss
    if clip_available():
        CLIPLoss("a photo")  # exercised only when weights exist
    else:
        import pytest
        with pytest.raises(ImportError):
            CLIPLoss("a photo")


def test_online_event_poses_match_precomputed():
    """precompute_evs_poses=0: device slerp poses must track the host
    Slerp+cubic precompute (reference provider.py:1410-1420 switch)."""
    data = synthetic.simulate_events(H=32, W=32, n_frames=20, C=0.12, turns=0.4)
    kw = dict(batch_size_evs=64)
    pre = EventProvider(data["events"], data["frame_ts"], data["poses"],
                        data["intrinsics"], 32, 32,
                        precompute_evs_poses=True, **kw)
    onl = EventProvider(data["events"], data["frame_ts"], data["poses"],
                        data["intrinsics"], 32, 32,
                        precompute_evs_poses=False, **kw)
    assert onl.poses_evs is None  # zero per-event pose memory
    b1 = pre.train_step_batch(jax.random.PRNGKey(3))
    b2 = onl.train_step_batch(jax.random.PRNGKey(3))
    for k in ("rays_evs_o1", "rays_evs_d1", "rays_evs_o2", "rays_evs_d2"):
        # rotations slerp identically; translations are cubic on both sides
        # (device: Catmull-Rom Hermite, host: scipy natural spline) — they
        # differ only in end conditions near the first/last knots
        np.testing.assert_allclose(np.asarray(b1[k]), np.asarray(b2[k]),
                                   atol=4e-3, err_msg=k)


def test_negative_sampling_is_device_resident():
    """The no-event branch must not touch the host after setup (the
    provider's design contract, provider.py docstring)."""
    data = synthetic.simulate_events(H=32, W=32, n_frames=20, C=0.12, turns=0.4)
    prov = EventProvider(
        data["events"], data["frame_ts"], data["poses"], data["intrinsics"],
        32, 32, batch_size_evs=64, negative_event_sampling=True,
    )
    # the whole batch construction must be jit-traceable end to end
    jitted = jax.jit(prov.train_step_batch)
    b = jitted(jax.random.PRNGKey(5))
    for k in ("rays_no_evs_o1", "rays_no_evs_d2"):
        assert np.isfinite(np.asarray(b[k])).all()
    # no-event pixels really had no events in their chunk window
    assert int(prov.noev_count.min()) >= 0


def test_lpips_jax_metric_properties():
    """Built-in LPIPS: zero at identity, monotone under growing distortion,
    deterministic across calls (fixed seed)."""
    from enerf_tpu.train.lpips_jax import lpips_distance
    from enerf_tpu.train import metrics as M

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    base = img * 0 + img  # copy
    d0 = lpips_distance(img, base)
    assert d0 < 1e-6

    noise = rng.normal(0, 1, img.shape).astype(np.float32)
    d_small = lpips_distance(img, np.clip(img + 0.05 * noise, 0, 1))
    d_big = lpips_distance(img, np.clip(img + 0.3 * noise, 0, 1))
    assert 0 < d_small < d_big

    # deterministic
    assert lpips_distance(img, np.clip(img + 0.05 * noise, 0, 1)) == d_small

    # grayscale path + the metrics entry point return real numbers now
    g = img[..., :1]
    a, v = M.compute_lpips(g + 0.1, g, rgb_channels=1)
    assert a is not None and v is not None and np.isfinite([a, v]).all()
    assert M.lpips_label() == "_rand"


def test_run_diagnostics_full_breadth(tmp_path):
    """dump_run_diagnostics writes the full artifact set for an event
    provider with negative sampling (reference plot_utils auto-dump role)."""
    from enerf_tpu.utils.plotting import dump_run_diagnostics

    d = synthetic.simulate_events(H=32, W=32, n_frames=20, C=0.12, turns=0.4)
    prov = EventProvider(
        d["events"], d["frame_ts"], d["poses"], d["intrinsics"],
        32, 32, batch_size_evs=64, negative_event_sampling=True,
    )
    prov.train_poses = d["poses"]
    prov.intrinsics = d["intrinsics"]
    out = dump_run_diagnostics(str(tmp_path), prov)
    assert not any(str(p).startswith("(skipped") for p in out), out
    names = {os.path.basename(str(p)) for p in out}
    assert {"ev_accumulation.png", "ev_histogram.png", "hf_trajectory.png",
            "ev_rate.png", "noev_coverage.png", "train_poses.png",
            "train_rays.png"} <= names


def test_lpips_external_weights_roundtrip(tmp_path, monkeypatch):
    """$ENERF_LPIPS_WEIGHTS end-to-end: an npz in the export schema
    (scripts/export_lpips_weights.py) switches lpips_jax to the calibrated
    path and metric labels drop the `_rand` suffix (VERDICT round-2 item
    9); removing it restores the seeded-random fallback."""
    import enerf_tpu.train.lpips_jax as LJ
    from enerf_tpu.train.metrics import lpips_label

    rng = np.random.default_rng(0)
    img0 = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    img1 = np.clip(img0 + 0.1 * rng.normal(size=img0.shape), 0, 1).astype(
        np.float32)

    LJ._get_net.cache_clear()
    monkeypatch.delenv("ENERF_LPIPS_WEIGHTS", raising=False)
    d_rand = LJ.lpips_distance(img0, img1, "alex")
    assert lpips_label() == "_rand"

    # build a schema-correct weight file (random values stand in for the
    # torch-lpips export, exercising the identical load/compute path)
    out = {}
    cin = 3
    for i, (cout, k, _, _) in enumerate(LJ._ALEX):
        out[f"alex_conv{i}_w"] = rng.normal(
            scale=0.05, size=(k, k, cin, cout)).astype(np.float32)
        out[f"alex_conv{i}_b"] = np.zeros(cout, np.float32)
        cin = cout
    for j, (cout, _) in enumerate([(64, 0), (192, 0), (384, 0), (256, 0),
                                   (256, 0)]):
        out[f"alex_lin{j}"] = rng.uniform(
            0, 1, size=(cout,)).astype(np.float32)
    cin = 3
    i = 0
    for cout, reps in LJ._VGG_BLOCKS:
        for _ in range(reps):
            out[f"vgg_conv{i}_w"] = rng.normal(
                scale=0.05, size=(3, 3, cin, cout)).astype(np.float32)
            out[f"vgg_conv{i}_b"] = np.zeros(cout, np.float32)
            cin = cout
            i += 1
    for j, (cout, _) in enumerate(LJ._VGG_BLOCKS):
        out[f"vgg_lin{j}"] = rng.uniform(0, 1, size=(cout,)).astype(
            np.float32)
    wpath = str(tmp_path / "lpips_weights.npz")
    np.savez(wpath, **out)

    monkeypatch.setenv("ENERF_LPIPS_WEIGHTS", wpath)
    LJ._get_net.cache_clear()
    assert LJ.lpips_is_calibrated()
    assert lpips_label() == ""
    d_cal = LJ.lpips_distance(img0, img1, "alex")
    d_cal_vgg = LJ.lpips_distance(img0, img1, "vgg")
    assert d_cal != d_rand and d_cal > 0 and d_cal_vgg > 0
    assert LJ.lpips_distance(img0, img0, "alex") < 1e-6

    monkeypatch.delenv("ENERF_LPIPS_WEIGHTS")
    LJ._get_net.cache_clear()
    assert lpips_label() == "_rand"


def test_bench_watchdog_emits_diagnostic_line():
    """bench.py must ALWAYS print a parseable JSON line — on a budget
    blowout (the BENCH_r04 rc=124 scenario) the watchdog kills the child
    and emits value 0.0 with the last [bench-phase] reached."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"),
         "--n_rays", "64", "--num_samples", "8"],
        env={**os.environ, "ENERF_PLATFORM": "cpu",
             "ENERF_BENCH_BUDGET": "4"},
        capture_output=True, text=True, timeout=120)
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert lines, f"no stdout (stderr: {out.stderr[-300:]})"
    d = json.loads(lines[-1])
    assert d["value"] == 0.0 and "error" in d and "phase" in d["error"], d
    assert out.returncode == 0
