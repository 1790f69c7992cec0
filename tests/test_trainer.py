"""Trainer orchestration smoke tests: train/eval/ckpt/resume/mesh/CLI."""

import os

import numpy as np
import jax
import pytest

from tests_config_helper import tiny_cfg  # shared: keeps jit-cache shapes
                                          # identical across test modules


@pytest.mark.slow
def test_trainer_frames_end_to_end(tmp_path):
    from enerf_tpu.train.trainer import Trainer
    from enerf_tpu.data.provider import make_providers

    cfg = tiny_cfg(tmp_path)
    trainer = Trainer(cfg, use_checkpoint="scratch")
    train_p, val_p = make_providers(cfg)
    train_p.steps_per_epoch = 30
    trainer.train(train_p, val_p, max_epoch=2)

    # checkpoints written + rotating
    assert trainer.ckpt.latest() is not None
    # eval ran and produced validation artifacts
    assert os.path.isdir(os.path.join(trainer.workspace, "validation", "prediction"))
    assert trainer.stats["psnr"], "no eval metric recorded"

    # resume: a fresh trainer picks up the checkpoint
    t2 = Trainer(cfg, workspace=trainer.workspace, use_checkpoint="latest")
    assert int(t2.state.step) == int(trainer.state.step)
    assert t2.epoch == trainer.epoch

    # mesh export (small resolution)
    path = trainer.save_mesh(resolution=48, threshold=1.0)
    assert os.path.exists(path)
    assert os.path.getsize(path) > 100


@pytest.mark.slow
def test_trainer_events_end_to_end(tmp_path):
    from enerf_tpu.train.trainer import Trainer
    from enerf_tpu.data.provider import make_providers

    cfg = tiny_cfg(
        tmp_path, events=1, event_only=1, out_dim_color=1, use_luma=0,
        C_thres=0.2,
    )
    trainer = Trainer(cfg, use_checkpoint="scratch")
    train_p, val_p = make_providers(cfg)
    train_p.steps_per_epoch = 25
    trainer.train(train_p, val_p, max_epoch=1)
    results = trainer.evaluate(val_p, save=False)
    # event-only eval must report affine-corrected metrics
    assert "psnr_corrected" in results and np.isfinite(results["psnr_corrected"])
    assert "affine_a" in results


@pytest.mark.slow
def test_trainer_occupancy_path(tmp_path):
    from enerf_tpu.train.trainer import Trainer
    from enerf_tpu.data.provider import make_providers

    cfg = tiny_cfg(tmp_path, cuda_ray=True)
    trainer = Trainer(cfg, use_checkpoint="scratch")
    assert trainer.occupancy is not None
    train_p, val_p = make_providers(cfg)
    train_p.steps_per_epoch = 18  # crosses the every-16-steps update
    trainer.train(train_p, None, max_epoch=1)
    assert int(trainer.occupancy.iter_density) >= 1
    img, depth = trainer.render_view(
        train_p.train_poses[0], train_p.intrinsics, cfg.H, cfg.W
    )
    assert img.shape == (cfg.H, cfg.W, 3) and np.isfinite(img).all()


@pytest.mark.slow
def test_fused_chunk_matches_per_step_convergence(tmp_path):
    """train/chunk.py: the fused 16-step program must advance the step
    count exactly, update occupancy on the 16-step cadence, update the
    error map, and converge like the per-step path."""
    from enerf_tpu.train.trainer import Trainer
    from enerf_tpu.data.provider import make_providers

    final_losses = {}
    for fuse in (1, 16):
        cfg = tiny_cfg(tmp_path, cuda_ray=True, error_map=True,
                       fuse_steps=fuse, expname=f"fuse{fuse}", log_every=4)
        trainer = Trainer(cfg, use_checkpoint="scratch")
        train_p, val_p = make_providers(cfg)
        train_p.steps_per_epoch = 32
        trainer.train(train_p, None, max_epoch=1)
        assert int(trainer.state.step) == 32
        assert int(trainer.occupancy.iter_density) == 2  # steps 0 and 16
        em = np.asarray(train_p.error_map)
        assert em.std() > 0, "error map not updated"
        final_losses[fuse] = trainer.stats["loss"][-1]
    # both paths land in the same loss regime (seeded but different RNG
    # streams; convergence-level agreement, not bitwise)
    a, b = final_losses[1], final_losses[16]
    assert np.isfinite(a) and np.isfinite(b)
    assert abs(a - b) < 0.5 * max(a, b) + 0.05, final_losses


@pytest.mark.slow
def test_cli_smoke(tmp_path):
    import main as cli

    # sizes match test_trainer_frames_end_to_end so jit caches are shared
    cli.main([
        "--mode", "synthetic", "--outdir", str(tmp_path), "--H", "24", "--W",
        "24", "--num_rays", "128", "--batch_size_evs", "128", "--num_steps",
        "24", "--iters", "20", "--lr", "0.01", "--out_dim_color", "3",
        "--eval_interval", "5", "--expname", "cli_smoke",
    ])
    ws = os.path.join(str(tmp_path), "testweek", "cli_smoke")
    assert os.path.isdir(os.path.join(ws, "results"))
    assert os.path.exists(os.path.join(ws, "args.json"))


@pytest.mark.slow
def test_march_warmup_switches_renderer(tmp_path):
    """--march_warmup trains the first N iters with the uniform fixed-step
    renderer, then switches to the march path (two distinct fused chunks)."""
    from enerf_tpu.config import build_config
    from enerf_tpu.train.trainer import Trainer
    from enerf_tpu.data.provider import make_providers

    cfg = build_config([
        "--mode", "synthetic", "--events", "1", "--event_only", "1",
        "--out_dim_color", "1", "--H", "16", "--W", "16",
        "--syn_frames", "6", "--C_thres", "0.2", "--bound", "1.0",
        "--cuda_ray", "--batch_size_evs", "32", "--march_samples", "4",
        "--max_steps", "32", "--num_steps", "8", "--iters", "8",
        "--fuse_steps", "2", "--march_warmup", "4",
        "--outdir", str(tmp_path), "--ckpt", "scratch",
    ])
    trainer = Trainer(cfg, use_checkpoint="scratch")
    train, val = make_providers(cfg, {})
    train.steps_per_epoch = 8
    trainer.train(train, None, max_epoch=1)
    # cache key = (mode, statics, chunk_len, mesh, warm, frozen)
    warm_keys = [k for k in trainer._chunk_cache if k[-2] is True]
    march_keys = [k for k in trainer._chunk_cache if k[-2] is False]
    assert warm_keys and march_keys, trainer._chunk_cache.keys()
    assert int(trainer.state.step) == 8


@pytest.mark.slow
def test_async_checkpoints_roundtrip(tmp_path):
    """--async_ckpt overlaps saves with training; resume sees identical
    state, rotation still holds, and wait() drains in-flight writes."""
    from enerf_tpu.train.checkpoints import CheckpointManager, load_checkpoint
    from enerf_tpu.train.trainer import Trainer
    from enerf_tpu.data.provider import make_providers

    cfg = tiny_cfg(tmp_path, async_ckpt=1, max_keep_ckpt=2,
                   expname="async_ck")
    trainer = Trainer(cfg, use_checkpoint="scratch")
    assert trainer.ckpt.async_save
    train_p, val_p = make_providers(cfg)
    train_p.steps_per_epoch = 10
    trainer.train(train_p, val_p, max_epoch=3)
    # train() drains pending saves; rotation kept max_keep epochs + best
    names = sorted(os.listdir(os.path.join(trainer.workspace, "checkpoints")))
    eps = [n for n in names if n.endswith(".npz") and "_ep" in n]
    assert len(eps) == 2, names
    assert not any(n.endswith(".tmp") for n in names), names

    # resume equality: async-saved state == live state
    t2 = Trainer(cfg, workspace=trainer.workspace, use_checkpoint="latest")
    assert int(t2.state.step) == int(trainer.state.step)
    a = np.asarray(trainer.state.params["sigma_w0"])
    b = np.asarray(t2.state.params["sigma_w0"])
    np.testing.assert_array_equal(a, b)
    # best_metric survives resume so the next eval can't clobber the best
    # checkpoint with a worse model (reference utils.py:1383-1398)
    assert np.isfinite(t2.best_metric)
    assert t2.best_metric == trainer.best_metric
    # the rotating save lands before that epoch's eval, so the restored
    # psnr history is a (possibly one-short) prefix of the live one
    n = len(t2.stats["psnr"])
    assert n >= len(trainer.stats["psnr"]) - 1
    assert t2.stats["psnr"] == trainer.stats["psnr"][:n]


@pytest.mark.slow
def test_wide_mlp_trains(tmp_path):
    """--hidden_dim/--hidden_dim_color/--geo_feat_dim widen the field MLPs
    (free on TPU — BENCH_NOTES.md: the MLPs are <1% of step time; the
    reference hard-codes 64, network.py:28/58)."""
    from enerf_tpu.config import build_config
    from enerf_tpu.train.trainer import Trainer
    from enerf_tpu.data.provider import make_providers

    cfg = build_config([
        "--mode", "synthetic", "--events", "1", "--event_only", "1",
        "--out_dim_color", "1", "--H", "16", "--W", "16",
        "--syn_frames", "6", "--C_thres", "0.2", "--bound", "1.0",
        "--cuda_ray", "--batch_size_evs", "32", "--march_samples", "4",
        "--max_steps", "32", "--num_steps", "8", "--iters", "4",
        "--fuse_steps", "2",
        "--hidden_dim", "128", "--hidden_dim_color", "128",
        "--geo_feat_dim", "31", "--log_every", "2",
        "--outdir", str(tmp_path), "--ckpt", "scratch",
    ])
    trainer = Trainer(cfg, use_checkpoint="scratch")
    assert trainer.state.params["sigma_w0"].shape[1] == 128
    assert trainer.state.params["sigma_w1"].shape == (128, 32)  # 1 + geo 31
    train, val = make_providers(cfg, {})
    train.steps_per_epoch = 4
    trainer.train(train, None, max_epoch=1)
    assert int(trainer.state.step) == 4
    assert np.isfinite(trainer.stats["loss"][-1])


def test_debug_nan_sentinel(tmp_path):
    """--debug_nan 1: the first non-finite loss aborts with a parameter-
    norm dump (SURVEY aux 'sanitizers' row; the reference trains blind
    through NaNs)."""
    import jax.numpy as jnp
    from enerf_tpu.config import Config
    from enerf_tpu.train.trainer import Trainer
    from enerf_tpu.data.provider import make_providers

    cfg = Config(
        mode="synthetic", events=0, H=16, W=16, syn_frames=4,
        iters=100, num_rays=64, num_steps=8, upsample_steps=0,
        outdir=str(tmp_path), expname="nan", ckpt="scratch",
        eval_interval=100, log_every=1, fuse_steps=1, debug_nan=1,
    ).validate()
    train_p, val_p = make_providers(cfg)
    tr = Trainer(cfg, use_checkpoint="scratch")
    # poison one weight -> forward produces NaN loss at the first step
    tr.state = tr.state._replace(params={
        **tr.state.params,
        "sigma_w0": tr.state.params["sigma_w0"] * jnp.nan,
    })
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        tr.train(train_p, val_p, max_epoch=1)
    assert os.path.exists(os.path.join(tr.workspace, "nan_dump.json"))


def test_divergence_guard_and_eval_log(tmp_path):
    """Collapse telemetry (VERDICT r4): guard_patience consecutive evals
    below best-guard_psnr_drop (or with affine a under guard_affine_a)
    halt the run; every eval appends a JSON line to cfg.eval_log."""
    import json
    from enerf_tpu.config import Config
    from enerf_tpu.train.trainer import Trainer

    log = tmp_path / "evals.jsonl"
    cfg = Config(
        mode="synthetic", events=0, H=16, W=16, syn_frames=4,
        iters=100, num_rays=64, num_steps=8, upsample_steps=0,
        outdir=str(tmp_path), expname="guard", ckpt="scratch",
        guard_collapse=1, guard_patience=2, guard_psnr_drop=2.0,
        guard_affine_a=0.4, eval_log=str(log),
    ).validate()
    tr = Trainer(cfg, use_checkpoint="scratch")

    # healthy eval: records best, no strike
    assert tr._eval_log({"psnr_corrected": 15.0, "affine_a": 1.0}, 100) is False
    tr.best_metric = 15.0
    # one bad eval (drop > 2 dB): strike 1, not yet halted
    assert tr._eval_log({"psnr_corrected": 12.5, "affine_a": 0.9}, 200) is False
    # recovery resets the strike counter
    assert tr._eval_log({"psnr_corrected": 14.5, "affine_a": 0.9}, 300) is False
    # washout signature (affine a < 0.4) twice in a row: halt
    assert tr._eval_log({"psnr_corrected": 14.9, "affine_a": 0.3}, 400) is False
    assert tr._eval_log({"psnr_corrected": 14.9, "affine_a": 0.35}, 500) is True

    lines = [json.loads(l) for l in log.read_text().splitlines()]
    assert len(lines) == 5
    assert lines[0]["psnr_corrected"] == 15.0
    assert lines[-1]["step"] == 500
    assert all("ts" in l and "workspace" in l for l in lines)


def test_divergence_guard_halts_training(tmp_path):
    """End-to-end: a train loop whose evals collapse stops early."""
    from enerf_tpu.config import Config
    from enerf_tpu.train.trainer import Trainer
    from enerf_tpu.data.provider import make_providers

    cfg = Config(
        mode="synthetic", events=0, H=16, W=16, syn_frames=4,
        iters=1000, num_rays=64, num_steps=8, upsample_steps=0,
        outdir=str(tmp_path), expname="guardtrain", ckpt="scratch",
        eval_interval=1, log_every=100, fuse_steps=1,
        guard_collapse=1, guard_patience=2, guard_psnr_drop=0.0,
    ).validate()
    train_p, val_p = make_providers(cfg)
    train_p.steps_per_epoch = 2
    tr = Trainer(cfg, use_checkpoint="scratch")
    # force the collapse signature: every eval scores far below a fake best
    tr.best_metric = 1e9
    tr.train(train_p, val_p, max_epoch=6)
    # guard_patience=2 with drop 0 -> halted after the 2nd eval epoch
    assert tr.epoch == 2, f"guard did not halt training (epoch={tr.epoch})"
