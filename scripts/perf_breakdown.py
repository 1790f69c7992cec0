"""Step-time breakdown of the production train step on the real TPU.

Times each stage of the march-path event step in isolation (same shapes
and statics as bench.py) so the next kernel attack is measurement-
directed rather than guessed:

  march        DDA occupancy march alone (fwd; no field eval)
  field_fwd    compacted field eval alone (encode + MLPs, fwd)
  composite    composite_from_march fwd (march excluded via pre-march)
  render_fwd   full single-render forward
  step_fwd     full event step forward (2 renders + loss)
  step_fwdbwd  value_and_grad of the step (what bench.py times)
  adam         optimizer update alone (grads precomputed)

Each timed with proper host sync after a compile warmup.  Run when the
chip is free: `python scripts/perf_breakdown.py [--num_levels 8 ...]`.
"""

import argparse
import sys
import time

if "--cpu" in sys.argv:  # must precede first device use (axon ignores
    import jax           # JAX_PLATFORMS — .claude/skills/verify/SKILL.md)
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    sys.path.insert(0, "/root/repo")
    from enerf_tpu.models.field import FieldStatic, init_field_params, field_forward
    from enerf_tpu.render.occupancy import ball_bitfield
    from enerf_tpu.render.march import (
        render_rays_march, march_rays, composite_from_march)
    from enerf_tpu.ops.aabb import near_far_from_aabb
    from enerf_tpu.train.state import init_train_state, apply_updates
    from enerf_tpu.train import losses

    ap = argparse.ArgumentParser()
    ap.add_argument("--n_rays", type=int, default=8192)
    ap.add_argument("--num_samples", type=int, default=32)
    ap.add_argument("--compact_frac", type=float, default=0.25)
    ap.add_argument("--share_march", type=int, default=1)
    ap.add_argument("--grid_block", type=int, default=3)
    ap.add_argument("--num_levels", type=int, default=8)
    ap.add_argument("--level_dim", type=int, default=4)
    ap.add_argument("--max_steps", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend (handled at import)")
    args = ap.parse_args(argv)

    static = FieldStatic(
        bound=1.0, out_dim_color=1, encoding="blockgrid",
        compute_dtype=jnp.bfloat16, grid_block=args.grid_block,
        num_levels=args.num_levels, level_dim=args.level_dim,
    )
    params = init_field_params(jax.random.PRNGKey(0), static)
    state, opt = init_train_state(params, lr0=1e-2, iters=10000)
    bitfield = ball_bitfield()

    n = args.n_rays
    key = jax.random.PRNGKey(1)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (n, 1))
    pols = jnp.ones((n,), jnp.float32)
    aabb = jnp.asarray([-1., -1., -1., 1., 1., 1.], jnp.float32)
    bg = jnp.full((n, 1), 0.5)
    cf = args.compact_frac
    S, MS = args.num_samples, args.max_steps

    @jax.jit
    def f_march(o, d, rng):
        nears, fars = near_far_from_aabb(o, d, aabb, 0.2)
        return march_rays(o, d, bitfield, nears, fars, rng,
                          num_samples=S, max_steps=MS,
                          cascades=bitfield.shape[0], bound=1.0, perturb=True)

    nears, fars = near_far_from_aabb(o, d, aabb, 0.2)
    ts, dts, valid = f_march(o, d, jax.random.PRNGKey(2))
    ts, dts, valid = jax.tree.map(jax.block_until_ready, (ts, dts, valid))

    @jax.jit
    def f_field(params):
        # field eval over the march's live-sample count (compacted budget)
        m = int(n * S * cf)
        x = jnp.tanh(jax.random.normal(jax.random.PRNGKey(3), (m, 3)))
        dd = jnp.tile(jnp.asarray([[0., 0., 1.]]), (m, 1))
        sig, col = field_forward(params, static, x, dd)
        return sig.sum() + col.sum()

    @jax.jit
    def f_composite(params):
        out = composite_from_march(params, static, o, d, ts, dts, valid,
                                   nears, fars, bg_color=bg, compact_frac=cf)
        return out["image"]

    @jax.jit
    def f_render(params, rng):
        out = render_rays_march(params, static, bitfield, o, d,
                                num_samples=S, max_steps=MS, bg_color=bg,
                                perturb=True, rng=rng, compact_frac=cf)
        return out["image"]

    def loss_fn(params, rng):
        k1, k2 = jax.random.split(rng)
        if args.share_march:
            t2, d2, v2 = march_rays(o, d, bitfield, nears, fars, k1,
                                    num_samples=S, max_steps=MS,
                                    cascades=bitfield.shape[0], bound=1.0,
                                    perturb=True)
            out1 = composite_from_march(params, static, o, d, t2, d2, v2,
                                        nears, fars, bg_color=bg,
                                        compact_frac=cf)
            out2 = composite_from_march(params, static, o + 0.01, d, t2, d2,
                                        v2, nears, fars, bg_color=bg,
                                        compact_frac=cf)
        else:
            out1 = render_rays_march(params, static, bitfield, o, d,
                                     num_samples=S, max_steps=MS, bg_color=bg,
                                     perturb=True, rng=k1, compact_frac=cf)
            out2 = render_rays_march(params, static, bitfield, o + 0.01, d,
                                     num_samples=S, max_steps=MS, bg_color=bg,
                                     perturb=True, rng=k2, compact_frac=cf)
        ll1 = losses.log_intensity(out1["image"], use_luma=False)
        ll2 = losses.log_intensity(out2["image"], use_luma=False)
        return losses.event_loss((ll2 - ll1)[None], pols[None, :, None],
                                 C_thres=0.2)

    f_step_fwd = jax.jit(loss_fn)
    f_step_grad = jax.jit(jax.value_and_grad(loss_fn))

    _, grads = f_step_grad(state.params, jax.random.PRNGKey(4))
    jax.block_until_ready(grads)

    @jax.jit
    def f_adam(state, grads):
        return apply_updates(state, grads, opt)

    rows = [
        ("march", timed(f_march, o, d, jax.random.PRNGKey(5))),
        ("field_fwd", timed(f_field, state.params)),
        ("composite", timed(f_composite, state.params)),
        ("render_fwd", timed(f_render, state.params, jax.random.PRNGKey(6))),
        ("step_fwd", timed(f_step_fwd, state.params, jax.random.PRNGKey(7))),
        ("step_fwdbwd", timed(f_step_grad, state.params, jax.random.PRNGKey(8))),
        ("adam", timed(f_adam, state, grads)),
    ]
    total = dict(rows)["step_fwdbwd"]
    print(f"config: {args.num_levels}x{args.level_dim} blk{args.grid_block} "
          f"share={args.share_march} n={n} S={S} cf={cf}")
    for name, t in rows:
        print(f"{name:12s} {t * 1e3:8.2f} ms   {t / total * 100:5.1f}% of step")
    print(f"rays/s (2x renders): {2 * n / total:,.0f}")


if __name__ == "__main__":
    main()
