"""Benchmark: alive-ray inference renderer vs the static eval march.

Drives VERDICT round-2 item 4's "done" criterion: >= faster full-image
eval at equal output.  Loads a trained checkpoint (so the occupancy grid
and the field are realistic — early termination only pays off on real
opacity), renders one full image with
  (a) the round-2 eval path: render_rays_march at the eval depth
      (max(2*march_samples, 128) live samples), chunked, and
  (b) render_rays_infer (lax.while_loop early-termination windows),
and reports wall-clock + max image difference.

Usage: python scripts/bench_eval_render.py --workspace output/.../R3a_fixed \
          [--view 0] [--H 128 --W 128]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", required=True)
    ap.add_argument("--H", type=int, default=128)
    ap.add_argument("--W", type=int, default=128)
    ap.add_argument("--pose_t", type=float, default=0.3)
    ap.add_argument("--march_samples", type=int, default=64)
    ap.add_argument("--max_steps", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--block", type=int, default=16,
                    help="alive-ray window size (samples per while-loop "
                         "iteration)")
    ap.add_argument("--ckpt", default="best", choices=["best", "latest"],
                    help="checkpoint to bench (best falls back to latest)")
    ap.add_argument("--build_occ", type=int, default=0,
                    help="build the occupancy grid from the trained field "
                         "with N update_occupancy passes — for checkpoints "
                         "trained on the fixed-step path (cuda_ray=False), "
                         "which carry no occupancy state")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from enerf_tpu.models.field import FieldStatic
    from enerf_tpu.render.march import render_rays_march, render_rays_infer
    from enerf_tpu.render.occupancy import init_occupancy
    from enerf_tpu.train.checkpoints import CheckpointManager
    from enerf_tpu.data import synthetic
    from enerf_tpu.data.rays import get_rays_full
    import json

    with open(os.path.join(args.workspace, "args.json")) as f:
        cfg = json.load(f)
    static = FieldStatic(
        bound=cfg["bound"], out_dim_color=cfg["out_dim_color"],
        encoding="blockgrid" if (cfg["ff"] or cfg["tcnn"]) else "hashgrid",
        use_fused_head=bool(cfg["ff"]) and bool(cfg["cuda_ray"]),
        compute_dtype=jnp.bfloat16 if cfg["fp16"] else jnp.float32,
        grid_block=cfg.get("grid_block", 4),
        num_levels=cfg.get("num_levels", 16),
        level_dim=cfg.get("level_dim", 2),
        hidden_dim=cfg.get("hidden_dim", 64),
        hidden_dim_color=cfg.get("hidden_dim_color", 64),
        geo_feat_dim=cfg.get("geo_feat_dim", 15),
    )
    from enerf_tpu.train.checkpoints import load_checkpoint
    ckpt = CheckpointManager(os.path.join(args.workspace, "checkpoints"),
                             name=cfg["expname"])
    from enerf_tpu.models.field import init_field_params
    from enerf_tpu.train.state import init_train_state
    params0 = init_field_params(jax.random.PRNGKey(0), static)
    state, _ = init_train_state(params0, cfg["lr"], cfg["iters"])
    occ = init_occupancy(cfg["bound"])
    # best-by-metric first (guard-halted runs keep their peak there;
    # benching an alive-ray win on a collapsed 'latest' field shows no
    # early-termination — the round-3 misty-scene 1.03x mistake)
    path = ckpt.resolve(getattr(args, "ckpt", "best"))
    assert path, f"no checkpoint under {args.workspace}"
    state, occ, meta = load_checkpoint(path, state, occ)
    params = state.ema_params
    if args.build_occ:
        from enerf_tpu.render.occupancy import update_occupancy
        k = jax.random.PRNGKey(7)
        for i in range(args.build_occ):
            k, ku = jax.random.split(k)
            occ = update_occupancy(params, static, occ, ku,
                                   density_scale=cfg["density_scale"],
                                   density_thresh=cfg["density_thresh"])
    print(f"loaded {os.path.basename(path)}; occupancy occupied frac "
          f"{float(jnp.mean(occ.occ_bitfield.astype(jnp.float32))):.4f}")

    H, W = args.H, args.W
    intr = synthetic.default_intrinsics(H, W, cfg.get("fovy", 60.0))
    pose = jnp.asarray(synthetic.circle_pose(args.pose_t), jnp.float32)
    ro, rd = get_rays_full(pose, intr, H, W)
    eval_samples = max(2 * args.march_samples, 128)

    def run_static():
        outs = []
        for s in range(0, ro.shape[0], args.chunk):
            o = render_rays_march(
                params, static, occ.occ_bitfield,
                ro[s:s + args.chunk], rd[s:s + args.chunk],
                num_samples=eval_samples, max_steps=args.max_steps,
                bg_color=1.0, min_near=cfg["min_near"],
                density_scale=cfg["density_scale"],
                dt_gamma=cfg["dt_gamma"])
            outs.append(o["image"])
        return jnp.concatenate(outs)

    def run_infer():
        outs = []
        for s in range(0, ro.shape[0], args.chunk):
            o = render_rays_infer(
                params, static, occ.occ_bitfield,
                ro[s:s + args.chunk], rd[s:s + args.chunk],
                block=args.block, max_steps=args.max_steps,
                bg_color=1.0, min_near=cfg["min_near"],
                density_scale=cfg["density_scale"],
                dt_gamma=cfg["dt_gamma"])
            outs.append(o["image"])
        return jnp.concatenate(outs)

    def timed(fn):
        img = fn()
        jax.block_until_ready(img)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            img = fn()
            jax.block_until_ready(img)
        return (time.perf_counter() - t0) / args.iters, np.asarray(img)

    dt_s, img_s = timed(run_static)
    dt_i, img_i = timed(run_infer)
    diff = np.abs(img_s - img_i).max()
    print(f"static eval march ({eval_samples} live samples): {dt_s*1e3:8.1f} ms/image")
    print(f"alive-ray infer   (max_steps {args.max_steps}):  {dt_i*1e3:8.1f} ms/image")
    print(f"speedup {dt_s/dt_i:.2f}x   max|image diff| {diff:.4f}")


if __name__ == "__main__":
    main()
