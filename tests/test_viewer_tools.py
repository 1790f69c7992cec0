"""Viewer, render script, plotting, mesh tooling tests."""

import math
import os

import numpy as np
import pytest

from enerf_tpu.viewer import OrbitCamera, GUIRenderer, TurntableRecorder
from enerf_tpu.utils.plotting import (
    render_ev_accumulation, event_histogram, plot_poses, plot_trajectory_timeline,
)
from enerf_tpu.utils.mesh import marching_tets


def test_orbit_camera_geometry():
    cam = OrbitCamera(64, 48, r=3.0, fovy=60.0)
    p = cam.pose
    # camera sits at radius, looks at center
    np.testing.assert_allclose(np.linalg.norm(p[:3, 3]), 3.0, rtol=1e-6)
    f = p[:3, 2]
    np.testing.assert_allclose(f, -p[:3, 3] / 3.0, atol=1e-6)
    # rotation valid
    np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3), atol=1e-8)
    cam.orbit(32, 0)
    assert abs(cam.yaw - math.pi) < 1e-6
    cam.scale(1)
    assert cam.radius < 3.0


def test_gui_renderer_progressive_and_dynamic(tmp_path):
    from enerf_tpu.train.trainer import Trainer
    from enerf_tpu.data.provider import make_providers
    from tests_config_helper import tiny_cfg

    cfg = tiny_cfg(tmp_path)
    trainer = Trainer(cfg, use_checkpoint="scratch")
    train_p, _ = make_providers(cfg)
    gui = GUIRenderer(trainer, train_p, W=32, H=32, frame_budget_ms=1e9)
    loss = gui.train_steps(4)
    assert np.isfinite(loss)
    f1 = gui.render_frame()
    assert gui.spp == 1
    f2 = gui.render_frame()
    assert gui.spp == 2  # progressive accumulation
    assert f2.shape == f1.shape
    gui.cam.orbit(4, 0)
    gui.reset_view()
    assert gui.spp == 0

    # dynamic downscale: tiny budget forces resolution down
    gui2 = GUIRenderer(trainer, train_p, W=64, H=64, frame_budget_ms=0.001)
    gui2.render_frame()
    gui2.reset_view()
    gui2.render_frame()
    assert gui2.downscale < 1.0


def test_turntable_and_render_script(tmp_path):
    from enerf_tpu.train.trainer import Trainer
    from enerf_tpu.data.provider import make_providers
    from tests_config_helper import tiny_cfg

    cfg = tiny_cfg(tmp_path)
    trainer = Trainer(cfg, use_checkpoint="scratch")
    train_p, _ = make_providers(cfg)
    train_p.steps_per_epoch = 5
    trainer.train(train_p, None, max_epoch=1)

    rec = TurntableRecorder(trainer, W=24, H=24)
    out = rec.record(str(tmp_path / "turntable"), n_frames=3)
    assert len(os.listdir(out)) == 3

    # render script end-to-end against the saved workspace
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "render_script", os.path.join(os.path.dirname(__file__), "..", "scripts", "render.py")
    )
    rs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rs)
    outdir = str(tmp_path / "renders")
    rs.main(["--model_dir", trainer.workspace, "--traj", "val",
             "--n_poses", "2", "--H", "24", "--W", "24", "--outdir", outdir])
    assert sorted(os.listdir(outdir))[:2] == ["0000.png", "0000_depth.png"]

    # quatlist input path
    qpath = str(tmp_path / "poses.txt")
    from scipy.spatial.transform import Rotation as R
    from enerf_tpu.data import synthetic
    pose = synthetic.circle_pose(0.3)
    q = R.from_matrix(pose[:3, :3]).as_quat()
    np.savetxt(qpath, np.asarray([[0.0, *pose[:3, 3], *q]]), header="ts px py pz qx qy qz qw")
    outdir2 = str(tmp_path / "renders_q")
    rs.main(["--model_dir", trainer.workspace, "--infile", qpath,
             "--H", "24", "--W", "24", "--outdir", outdir2])
    assert "0000.png" in os.listdir(outdir2)


def test_plotting(tmp_path):
    img = render_ev_accumulation([1, 2], [3, 4], [1, -1], 8, 8)
    assert img.shape == (8, 8, 3)
    assert tuple(img[3, 1]) == (0, 0, 255)
    assert tuple(img[4, 2]) == (255, 0, 0)

    h = event_histogram(np.asarray([1, 1]), np.asarray([2, 2]), np.asarray([1, 1]), 4, 4)
    assert h[2, 1] == 2

    from enerf_tpu.data import synthetic
    poses = np.stack([synthetic.circle_pose(t) for t in np.linspace(0, 1, 5)])
    p1 = plot_poses(str(tmp_path / "p.png"), poses)
    p2 = plot_trajectory_timeline(str(tmp_path / "t.png"), np.linspace(0, 1, 5), poses)
    assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000


def test_marching_tets_sphere():
    R_ = 24
    g = np.linspace(-1, 1, R_)
    xs, ys, zs = np.meshgrid(g, g, g, indexing="ij")
    u = 1.0 - np.sqrt(xs ** 2 + ys ** 2 + zs ** 2)  # sphere radius 0.5 at 0.5
    verts, tris = marching_tets(u, 0.5)
    assert len(verts) > 100 and len(tris) > 100
    # vertices lie on the isosurface: |x| ~= 0.5 in grid coords
    world = verts / (R_ - 1) * 2.0 - 1.0
    r = np.linalg.norm(world, axis=-1)
    np.testing.assert_allclose(r, 0.5, atol=0.06)
