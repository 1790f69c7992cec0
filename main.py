"""CLI entry point — the reference's main_nerf.py for the TPU framework.

Usage (reference-compatible config files):
  python main.py --config configs/spiral1_enerf.txt [--iters 30000 ...]
  python main.py --mode synthetic --events 1 --event_only 1 --out_dim_color 1 \
      --use_luma 0 --iters 2000            # in-process synthetic smoke run
  python main.py --config ... --test      # render test views + mesh

Parity: reference main_nerf.py:96-238 (config asserts, model factory,
train/test dispatch, post-train test render + mesh export).
"""

import os
import sys

import numpy as np

# The axon TPU plugin ignores JAX_PLATFORMS; honor an explicit override so
# CPU smoke runs don't grab the TPU tunnel.
if os.environ.get("ENERF_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["ENERF_PLATFORM"])

try:
    # Persistent compile cache for TRAINING runs, same rationale as
    # bench.py: the march train-step's cold compile via the remote-compile
    # tunnel runs 8-11 min, and a machine reset both wipes untracked files
    # and can bounce the compile pool (rounds 4-5 post-mortems).  Default
    # dir train_cache/ sits next to bench_cache/ and can be git-tracked so
    # warmth survives resets; only compiles >=10 s are persisted to keep
    # it to the handful of big step programs.
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "train_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass


def get_select_frames(cfg):
    """reference main_nerf.py:14-42."""
    sf = {
        "train_idxs": cfg.train_idxs,
        "val_idxs": cfg.val_idxs,
        "test_idxs": cfg.test_idxs or [0],
        "exclude_idxs": cfg.exclude_idxs,
    }
    for k in ("train_idxs", "val_idxs", "test_idxs"):
        if sf[k] is not None:
            assert np.all(np.diff(sf[k]) > 0), f"{k} must be strictly increasing"
            assert len(np.unique(sf[k])) == len(sf[k]), f"{k} must be unique"
    # the reference parses exclude_idxs but never consumes it (provider.py
    # takes only train/val/test); here it actually filters the selections
    if sf["exclude_idxs"]:
        ex = set(sf["exclude_idxs"])
        for k in ("train_idxs", "val_idxs", "test_idxs"):
            if sf[k] is not None:
                sf[k] = [i for i in sf[k] if i not in ex]
    return sf


def main(argv=None):
    from enerf_tpu.config import build_config
    from enerf_tpu.data.provider import make_providers
    from enerf_tpu.train.trainer import Trainer

    cfg = build_config(argv)
    select_frames = get_select_frames(cfg)

    mesh = None
    if cfg.multihost:
        # pod-slice run: same command on every worker
        # (launch/tpu_pod_launch.sh); topology from the TPU runtime
        from enerf_tpu.parallel import multihost
        multihost.initialize()
        mesh = multihost.global_mesh()
    elif cfg.mesh_shape:
        from enerf_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(int(np.prod(cfg.mesh_shape)))

    trainer = Trainer(cfg, use_checkpoint=cfg.ckpt, mesh=mesh)
    train_provider, val_provider = make_providers(cfg, select_frames)

    if cfg.gui:
        from enerf_tpu.viewer import GUIRenderer, serve_web_viewer
        gui = GUIRenderer(
            trainer, provider=None if cfg.test else train_provider,
            W=cfg.W, H=cfg.H, radius=cfg.radius, fovy=cfg.fovy,
            max_spp=cfg.max_spp,
        )
        serve_web_viewer(gui)
        return

    if cfg.test:
        trainer.test(val_provider)
        trainer.save_mesh(resolution=256, threshold=10.0)
        return

    max_epoch = int(np.ceil(cfg.iters / train_provider.steps_per_epoch))
    trainer.log(f"max epochs = {max_epoch}")
    trainer.train(train_provider, val_provider, max_epoch)
    trainer.test(val_provider)
    trainer.save_mesh(resolution=256, threshold=10.0)


if __name__ == "__main__":
    main(sys.argv[1:])
