"""The three reference training-mode switches, wired and behavior-tested:
--e2vid (image-source switch), images_corrupted (train-only corrupted
images), --rand_pose + CLIP guidance (random-pose semantic training).

The reference parses all three; e2vid/images_corrupted switch folders in
provider.py:487-545/731-735, while rand_pose/CLIP are dead there (clip_utils
imported nowhere, rand-pose collate branch dropped) — wired for real here.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import cv2
import pytest

from enerf_tpu.data import synthetic
from enerf_tpu.data.provider import (
    save_esim_dataset, load_esim_dataset, FramesProvider,
)


@pytest.fixture(scope="module")
def esim_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("esim_modes"))
    data = synthetic.simulate_events(H=24, W=24, n_frames=8, C=0.2, turns=0.3)
    save_esim_dataset(data, d)
    return d


def _write_stack(dirpath, base_images, transform):
    os.makedirs(dirpath, exist_ok=True)
    for i, im in enumerate(base_images):
        img8 = (np.clip(transform(im[..., 0]), 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(dirpath, f"{i:06d}.png"), img8)


def test_e2vid_image_source_switch(esim_dir):
    data0 = load_esim_dataset(esim_dir)
    # fabricate E2VID reconstructions: inverted images in the e2vid layout
    evdir = os.path.join(esim_dir, "e2vids", "e2vid_up4_v1", "e2calib")
    _write_stack(evdir, data0["images"], lambda x: 1.0 - x)

    data = load_esim_dataset(esim_dir, e2vid=4)
    # e2vid images replace the stack (train AND eval GT, reference :1093)
    np.testing.assert_allclose(
        data["images"], 1.0 - data0["images"], atol=2 / 255.0)
    assert "train_images" not in data

    with pytest.raises(AssertionError, match="no reconstruction dir"):
        load_esim_dataset(esim_dir, e2vid=7)


def test_images_corrupted_trains_dirty_evals_clean(esim_dir):
    data0 = load_esim_dataset(esim_dir)
    rng = np.random.default_rng(0)

    def corrupt(x):
        return np.clip(x + rng.normal(0, 0.25, x.shape), 0, 1)

    _write_stack(os.path.join(esim_dir, "images_corrupted"),
                 data0["images"], corrupt)
    data = load_esim_dataset(esim_dir, images_corrupted=True)
    np.testing.assert_allclose(data["images"], data0["images"], atol=1e-6)
    assert "train_images" in data
    diff = np.abs(data["train_images"] - data0["images"]).mean()
    assert diff > 0.05, "corrupted images should differ from clean"


def test_rand_pose_batch_cadence():
    imgs = np.random.default_rng(0).uniform(size=(3, 16, 16, 1)).astype(np.float32)
    poses = np.stack([synthetic.circle_pose(t) for t in [0.0, 0.2, 0.4]])
    prov = FramesProvider(imgs, poses, synthetic.default_intrinsics(16, 16),
                          num_rays=64, rand_pose=1, rand_radius=2.5)
    kinds = []
    for i in range(6):
        b = prov.train_step_batch(jax.random.PRNGKey(i))
        kinds.append("rand" if "rand_pose_side" in b else "gt")
        if "rand_pose_side" in b:
            side = b["rand_pose_side"]
            assert b["rays_o"].shape == (side * side, 3)
            assert "images" not in b
            # directions point at the scene (origin): negative dot with eye
            eye = np.asarray(b["rays_o"][0])
            d = np.asarray(b["rays_d"]).mean(0)
            assert np.dot(eye, d) < 0
    # rand_pose=1 -> every other batch is a random pose
    assert kinds == ["gt", "rand", "gt", "rand", "gt", "rand"]


def test_clip_guided_training_reduces_clip_loss():
    from enerf_tpu.train.clip_guidance import CLIPGuidance, StubEmbedder
    from enerf_tpu.models.field import FieldStatic, init_field_params
    from enerf_tpu.train.state import init_train_state
    from enerf_tpu.train.step import StepStatics, train_step_clip

    guidance = CLIPGuidance("a bright sphere", embedder=StubEmbedder(dim=32))
    static = FieldStatic(bound=1.0, out_dim_color=1, num_levels=4,
                         log2_hashmap_size=10)
    params = init_field_params(jax.random.PRNGKey(0), static)
    state, opt = init_train_state(params, 1e-2, 100)
    ss = StepStatics(
        field_static=static, num_steps=16, upsample_steps=0, min_near=0.2,
        density_scale=1.0, C_thres=0.2, event_only=True, use_luma=False,
        linlog=True, weight_loss_rgb=1.0, negative_event_sampling=False,
        w_no_ev=1.0, out_dim_color=1, clip_embedder=guidance.embedder,
    )
    prov = FramesProvider(
        np.zeros((1, 8, 8, 1), np.float32),
        np.stack([synthetic.circle_pose(0.0)]),
        synthetic.default_intrinsics(8, 8), num_rays=256, rand_pose=0,
    )
    losses = []
    for i in range(15):
        b = prov.train_step_batch(jax.random.PRNGKey(i))
        side = b.pop("rand_pose_side")
        state, aux = train_step_clip(
            state, b, jax.random.PRNGKey(100 + i), ss, opt,
            guidance.text_feat, side,
        )
        losses.append(float(aux["loss_clip"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), (
        f"clip guidance did not optimize: {losses[:3]} -> {losses[-3:]}"
    )


def test_three_backbones_distinct(tmp_path):
    """--ff / --tcnn / vanilla select three distinct backbones (mutual
    oracles, reference network.py / network_ff.py / network_tcnn.py)."""
    from enerf_tpu.config import build_config
    from enerf_tpu.train.trainer import Trainer

    def mk(extra):
        cfg = build_config(["--mode", "synthetic", "--H", "16", "--W", "16",
                            "--syn_frames", "4", "--iters", "1",
                            "--num_rays", "32", "--cuda_ray",
                            "--outdir", str(tmp_path), "--ckpt", "scratch",
                            *extra])
        return Trainer(cfg).static

    vanilla = mk([])
    ff = mk(["--ff"])
    tcnn = mk(["--tcnn"])
    assert vanilla.encoding == "hashgrid" and not vanilla.use_fused_head
    assert ff.encoding == "blockgrid" and ff.use_fused_head
    assert tcnn.encoding == "blockgrid" and not tcnn.use_fused_head
