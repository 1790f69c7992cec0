"""Tests for the occupancy grid and the march renderer."""

import numpy as np
import jax
import jax.numpy as jnp

from enerf_tpu.models.field import FieldStatic, init_field_params
from enerf_tpu.render.occupancy import (
    GRID_SIZE, OccupancyState, init_occupancy, num_cascades, update_occupancy,
    mark_untrained_grid,
)
from enerf_tpu.render.march import march_rays, render_rays_march
from enerf_tpu.ops.aabb import near_far_from_aabb
from enerf_tpu.data import synthetic

from oracles import march_oracle


def small_static():
    return FieldStatic(bound=1.0, out_dim_color=1, num_levels=4, log2_hashmap_size=10)


def test_init_and_cascades():
    assert num_cascades(1.0) == 1
    assert num_cascades(2.0) == 2
    assert num_cascades(3.0) == 3
    occ = init_occupancy(2.0)
    assert occ.density_grid.shape == (2, GRID_SIZE ** 3)
    assert not bool(occ.occ_bitfield.any())


def test_update_occupancy_full_and_partial():
    static = small_static()
    params = init_field_params(jax.random.PRNGKey(0), static)
    occ = init_occupancy(1.0)
    occ2 = update_occupancy(params, static, occ, jax.random.PRNGKey(1))
    assert int(occ2.iter_density) == 1
    g = np.asarray(occ2.density_grid)
    assert np.isfinite(g).all() and (g >= 0).all()
    assert float(occ2.mean_density) > 0
    # partial branch
    occ3 = occ2._replace(iter_density=jnp.asarray(20, jnp.int32))
    occ4 = update_occupancy(params, static, occ3, jax.random.PRNGKey(2))
    assert int(occ4.iter_density) == 21
    assert np.isfinite(np.asarray(occ4.density_grid)).all()


def test_march_matches_oracle():
    # occupied ball of radius 0.4 at origin, single cascade
    H = GRID_SIZE
    g = np.arange(H)
    xs, ys, zs = np.meshgrid(g, g, g, indexing="ij")
    centers = 2.0 * np.stack([xs, ys, zs], -1) / (H - 1) - 1.0
    occ_np = (np.linalg.norm(centers, axis=-1) < 0.4).reshape(1, -1)
    bitfield = jnp.asarray(occ_np)

    n = 8
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (n, 3))
    d = np.asarray(d / jnp.linalg.norm(d, axis=-1, keepdims=True))
    o = np.tile(np.asarray([[0.0, 0.0, -2.0]]), (n, 1))
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    nears, fars = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb, 0.2)

    ts, dts, valid = march_rays(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32), bitfield,
        nears, fars, jax.random.PRNGKey(1),
        num_samples=64, max_steps=1024, cascades=1, bound=1.0,
    )
    ts, dts, valid = np.asarray(ts), np.asarray(dts), np.asarray(valid)

    for i in range(n):
        if nears[i] > 1e30:
            assert not valid[i].any()
            continue
        ref_ts, ref_dts = march_oracle(
            o[i], d[i], occ_np, float(nears[i]), float(fars[i]), 1.0, 1
        )
        got = ts[i][valid[i]]
        # the bounded skip loop may emit slightly fewer samples than the
        # unbounded oracle; every emitted sample must match the oracle prefix
        assert len(got) <= len(ref_ts) + 1
        m = min(len(got), len(ref_ts))
        np.testing.assert_allclose(got[:m], ref_ts[:m], rtol=1e-4, atol=1e-5)
        assert m >= min(len(ref_ts), 60) * 0.95, (
            f"ray {i}: only {m} of {len(ref_ts)} oracle samples matched"
        )


def test_march_render_empty_grid_gives_bg():
    static = small_static()
    params = init_field_params(jax.random.PRNGKey(0), static)
    occ = init_occupancy(1.0)  # all empty
    key = jax.random.PRNGKey(1)
    d = jax.random.normal(key, (16, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (16, 1))
    out = render_rays_march(
        params, static, occ.occ_bitfield, o, d, num_samples=32, bg_color=0.7
    )
    np.testing.assert_allclose(np.asarray(out["image"]), 0.7, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["weights_sum"]), 0.0, atol=1e-6)


def test_march_render_matches_fixed_step_on_trained_field():
    """With a fully-occupied grid the march render should be close to the
    fixed-step render (same field, comparable step counts)."""
    from enerf_tpu.render.renderer import render_rays

    static = small_static()
    params = init_field_params(jax.random.PRNGKey(3), static)
    occ = init_occupancy(1.0)
    occ = occ._replace(occ_bitfield=jnp.ones_like(occ.occ_bitfield))

    H = W = 8
    intr = synthetic.default_intrinsics(H, W)
    pose = jnp.asarray(synthetic.circle_pose(0.0), jnp.float32)
    from enerf_tpu.data.rays import get_rays_full
    ro, rd = get_rays_full(pose, intr, H, W)

    out_m = render_rays_march(
        params, static, occ.occ_bitfield, ro, rd,
        num_samples=256, max_steps=256, bg_color=1.0,
    )
    out_f = render_rays(
        params, static, ro, rd, num_steps=256, bg_color=1.0,
        perturb=False, train=False,
    )
    # same field, dense sampling in both: images should agree closely
    np.testing.assert_allclose(
        np.asarray(out_m["image"]), np.asarray(out_f["image"]), atol=0.05
    )


def test_mark_untrained():
    occ = init_occupancy(1.0)
    pose = synthetic.circle_pose(0.0)
    intr = synthetic.default_intrinsics(32, 32)
    occ2 = mark_untrained_grid(occ, pose[None], intr, 1.0)
    g = np.asarray(occ2.density_grid)
    assert (g == -1).any(), "no cells culled"
    assert (g == 0).any(), "all cells culled"


def test_march_compaction_matches_full():
    """Compacted field evaluation must reproduce the uncompacted render
    when the budget covers all valid samples."""
    static = small_static()
    params = init_field_params(jax.random.PRNGKey(3), static)
    H = GRID_SIZE
    g = np.arange(H)
    xs, ys, zs = np.meshgrid(g, g, g, indexing="ij")
    centers = 2.0 * np.stack([xs, ys, zs], -1) / (H - 1) - 1.0
    ball = (np.linalg.norm(centers, axis=-1) < 0.4).reshape(1, -1)
    occ = init_occupancy(1.0)._replace(occ_bitfield=jnp.asarray(ball))

    key = jax.random.PRNGKey(1)
    d = jax.random.normal(key, (32, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (32, 1))

    full = render_rays_march(
        params, static, occ.occ_bitfield, o, d, num_samples=32, bg_color=0.5
    )
    comp = render_rays_march(
        params, static, occ.occ_bitfield, o, d, num_samples=32, bg_color=0.5,
        compact_frac=1.0,  # budget == all lanes: must match exactly
    )
    np.testing.assert_allclose(
        np.asarray(comp["image"]), np.asarray(full["image"]), atol=1e-5
    )
    # tight budget still renders finite images
    comp2 = render_rays_march(
        params, static, occ.occ_bitfield, o, d, num_samples=32, bg_color=0.5,
        compact_frac=0.25,
    )
    assert np.isfinite(np.asarray(comp2["image"])).all()

    # gradients flow through the compaction
    def loss(p):
        out = render_rays_march(
            p, static, occ.occ_bitfield, o, d, num_samples=32, bg_color=0.5,
            compact_frac=0.5,
        )
        return jnp.sum(out["image"] ** 2)

    gr = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(gr))


def test_shared_march_event_step():
    """share_march: one DDA march reused for both renders of the pair."""
    from enerf_tpu.train.state import init_train_state
    from enerf_tpu.train.step import StepStatics, train_step_events

    static = small_static()
    params = init_field_params(jax.random.PRNGKey(0), static)
    state, opt = init_train_state(params, 1e-2, 100)
    occ = init_occupancy(1.0)
    occ_bf = jnp.ones_like(occ.occ_bitfield)

    ss = StepStatics(
        field_static=static, num_steps=16, upsample_steps=0, min_near=0.2,
        density_scale=1.0, C_thres=0.2, event_only=True, use_luma=False,
        linlog=True, weight_loss_rgb=1.0, negative_event_sampling=False,
        w_no_ev=1.0, out_dim_color=1, use_march=True, march_samples=16,
        compact_frac=0.5, share_march=True,
    )
    key = jax.random.PRNGKey(1)
    d = jnp.asarray([[0.0, 0.0, 1.0]]) + 0.15 * jax.random.normal(key, (32, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (32, 1))
    batch = {
        "rays_evs_o1": o, "rays_evs_d1": d,
        "rays_evs_o2": o + 0.005, "rays_evs_d2": d,
        "pols": jnp.ones((32,), jnp.float32),
    }
    losses = []
    for i in range(12):
        state, aux = train_step_events(
            state, batch, jax.random.PRNGKey(2 + i), ss, opt, occ_bf
        )
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], "shared-march step did not reduce loss"

    # no-event pair shares its march too (step.py _render_pair_shared)
    ss_no = ss._replace(negative_event_sampling=True)
    batch_no = dict(
        batch,
        rays_no_evs_o1=o, rays_no_evs_d1=d,
        rays_no_evs_o2=o + 0.005, rays_no_evs_d2=d,
    )
    state, aux = train_step_events(
        state, batch_no, jax.random.PRNGKey(99), ss_no, opt, occ_bf
    )
    assert "loss_no_evs" in aux and np.isfinite(float(aux["loss_no_evs"]))


def test_march_long_corridor_recall():
    """bound=3 worst case: a far-corner cluster behind a long empty
    diagonal.  The capped-while empty-space skip must not starve sample
    emission (the old fixed-8 budget found <35% of reachable samples)."""
    from enerf_tpu.ops.aabb import near_far_from_aabb
    from enerf_tpu.render.occupancy import GRID_SIZE

    bound, cascades, H = 3.0, 3, GRID_SIZE
    occ = np.zeros((cascades, H, H, H), bool)
    occ[:, H - 6:H - 2, H - 6:H - 2, H - 6:H - 2] = True
    occ_b = jnp.asarray(occ.reshape(cascades, -1))

    rng = np.random.RandomState(1)
    n = 64
    o = np.tile(np.array([[-2.9, -2.9, -2.9]], np.float32), (n, 1))
    tgt = rng.uniform(2.45, 2.8, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    aabb = jnp.asarray([-bound] * 3 + [bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(o, d, aabb, 0.2)

    def emitted(num_samples, skip_iters):
        _, _, valid = march_rays(
            o, d, occ_b, nears, fars, jax.random.PRNGKey(0),
            num_samples=num_samples, max_steps=1024, cascades=cascades,
            bound=bound, perturb=False, skip_iters=skip_iters)
        return int(np.asarray(valid).sum())

    # unconstrained reference: big slot budget + big skip cap
    oracle = emitted(128, 256)
    got = emitted(32, 64)  # production-ish budget with the default cap
    assert oracle > 0
    # remaining gap is slot capacity (reference mean_count-style budget),
    # not skip starvation
    assert got > 0.4 * oracle, (got, oracle)


def test_infer_renderer_matches_march_render():
    """render_rays_infer (alive-ray early-termination loop,
    raymarching.cu:701-938 role) must produce the same image as the
    full-depth static march at matched sampling."""
    from enerf_tpu.render.march import render_rays_infer

    static = small_static()
    params = init_field_params(jax.random.PRNGKey(3), static)
    occ = init_occupancy(1.0)
    occ = occ._replace(occ_bitfield=jnp.ones_like(occ.occ_bitfield))

    H = W = 8
    intr = synthetic.default_intrinsics(H, W)
    pose = jnp.asarray(synthetic.circle_pose(0.3), jnp.float32)
    from enerf_tpu.data.rays import get_rays_full
    ro, rd = get_rays_full(pose, intr, H, W)

    full = render_rays_march(
        params, static, occ.occ_bitfield, ro, rd,
        num_samples=256, max_steps=256, bg_color=1.0,
    )
    inf = render_rays_infer(
        params, static, occ.occ_bitfield, ro, rd,
        block=16, max_steps=256, bg_color=1.0,
    )
    # an UNtrained field is nearly transparent: no ray terminates early, so
    # this checks exact compositing equivalence across the window splits
    np.testing.assert_allclose(
        np.asarray(inf["image"]), np.asarray(full["image"]), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(inf["depth"]), np.asarray(full["depth"]), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(inf["weights_sum"]), np.asarray(full["weights_sum"]),
        atol=2e-3)


def test_infer_renderer_early_termination_on_opaque_field():
    """With an opaque field, the alive-ray loop must still match the
    full-depth march (rays retire at T < 1e-4; the tail they skip
    contributes nothing) and the weights must saturate."""
    from enerf_tpu.render.march import render_rays_infer

    static = small_static()
    params = init_field_params(jax.random.PRNGKey(4), static)
    occ = init_occupancy(1.0)
    occ = occ._replace(occ_bitfield=jnp.ones_like(occ.occ_bitfield))

    H = W = 8
    intr = synthetic.default_intrinsics(H, W)
    pose = jnp.asarray(synthetic.circle_pose(0.6), jnp.float32)
    from enerf_tpu.data.rays import get_rays_full
    ro, rd = get_rays_full(pose, intr, H, W)

    # opacity via density_scale (alpha ~ 1-exp(-dt*1000*sigma) saturates
    # within a few samples), exercising per-ray retirement mid-march
    full = render_rays_march(
        params, static, occ.occ_bitfield, ro, rd,
        num_samples=512, max_steps=512, bg_color=0.3, density_scale=1000.0,
    )
    inf = render_rays_infer(
        params, static, occ.occ_bitfield, ro, rd,
        block=16, max_steps=512, bg_color=0.3, density_scale=1000.0,
    )
    np.testing.assert_allclose(
        np.asarray(inf["image"]), np.asarray(full["image"]), atol=3e-3)
    assert float(jnp.max(inf["weights_sum"])) > 0.999
