"""End-to-end training tests: frames mode and event mode on synthetic data."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from enerf_tpu.models.field import FieldStatic, init_field_params
from enerf_tpu.render.renderer import render_rays
from enerf_tpu.data import synthetic
from enerf_tpu.data.rays import get_rays_full, get_rays_sampled, get_event_rays
from enerf_tpu.data.events import build_event_chains, sample_event_batch
from enerf_tpu.data.poses import make_pose_interpolator
from enerf_tpu.train.state import init_train_state
from enerf_tpu.train.step import StepStatics, train_step_frames, train_step_events
from enerf_tpu.train.metrics import psnr


def tiny_static(out_dim_color=3, compute_dtype=jnp.float32):
    return FieldStatic(
        bound=1.0,
        out_dim_color=out_dim_color,
        num_levels=8,
        log2_hashmap_size=13,
        compute_dtype=compute_dtype,
    )


def test_frame_training_converges():
    H = W = 32
    intr = synthetic.default_intrinsics(H, W)
    poses = [synthetic.circle_pose(t) for t in np.linspace(0, 0.5, 4)]
    gts = [synthetic.render_gt(p, intr, H, W, with_alpha=True) for p in poses]

    static = tiny_static()
    params = init_field_params(jax.random.PRNGKey(42), static)
    state, opt = init_train_state(params, lr0=1e-2, iters=300)
    ss = StepStatics(
        field_static=static, num_steps=48, upsample_steps=0, min_near=0.2,
        density_scale=1.0, C_thres=0.2, event_only=False, use_luma=False,
        linlog=True, weight_loss_rgb=1.0, negative_event_sampling=False,
        w_no_ev=1.0, out_dim_color=3,
    )

    poses_j = jnp.asarray(np.stack(poses), jnp.float32)
    gts_j = jnp.asarray(np.stack(gts)).reshape(len(poses), -1, 4)

    losses = []
    key = jax.random.PRNGKey(0)
    for it in range(150):
        key, k1, k2 = jax.random.split(key, 3)
        pi = int(np.asarray(jax.random.randint(k1, (), 0, len(poses))))
        rays = get_rays_sampled(k2, poses_j[pi], intr, H, W, 256)
        batch = {
            "rays_o": rays["rays_o"],
            "rays_d": rays["rays_d"],
            "images": gts_j[pi][rays["inds"]],
        }
        key, k3 = jax.random.split(key)
        state, aux = train_step_frames(state, batch, k3, ss, opt)
        losses.append(float(aux["loss"]))

    assert np.mean(losses[-10:]) < 0.3 * np.mean(losses[:10]), (
        f"loss did not converge: {np.mean(losses[:10])} -> {np.mean(losses[-10:])}"
    )

    # rendered eval image beats a flat prediction
    ro, rd = get_rays_full(poses_j[0], intr, H, W)
    out = render_rays(
        state.ema_params, static, ro, rd, num_steps=48, bg_color=1.0,
        perturb=False, train=False,
    )
    gt_white = synthetic.render_gt(np.asarray(poses_j[0]), intr, H, W)
    pred = np.asarray(out["image"]).reshape(H, W, 3)
    p = psnr(pred, gt_white)
    flat = psnr(np.full_like(gt_white, gt_white.mean()), gt_white)
    assert p > flat + 2.0, f"PSNR {p:.2f} not better than flat {flat:.2f}"


@pytest.mark.slow
@pytest.mark.slow
def test_event_training_decreases_loss():
    data = synthetic.simulate_events(H=48, W=48, n_frames=40, C=0.1, turns=0.5)
    assert data["events"].shape[0] > 2000, "simulator produced too few events"

    chains, ev_ts_sorted = build_event_chains(data["events"])
    interp = make_pose_interpolator(data["frame_ts"], data["poses"])
    poses_evs = jnp.asarray(interp(ev_ts_sorted))  # [M, 3, 4]

    static = tiny_static(out_dim_color=1)
    params = init_field_params(jax.random.PRNGKey(7), static)
    state, opt = init_train_state(params, lr0=1e-2, iters=400)
    ss = StepStatics(
        field_static=static, num_steps=48, upsample_steps=0, min_near=0.2,
        density_scale=1.0, C_thres=float(data["C"]), event_only=True,
        use_luma=False, linlog=True, weight_loss_rgb=1.0,
        negative_event_sampling=False, w_no_ev=1.0, out_dim_color=1,
    )

    intr = data["intrinsics"]
    losses = []
    key = jax.random.PRNGKey(1)
    for it in range(120):
        key, ks, kt = jax.random.split(key, 3)
        samp = sample_event_batch(ks, chains, 0, 512)
        xs = chains.xs[samp["idx_start"]]
        ys = chains.ys[samp["idx_start"]]
        rays = get_event_rays(
            xs, ys, poses_evs[samp["idx_start"]], poses_evs[samp["idx_end"]], intr
        )
        batch = dict(rays, pols=samp["pols"])
        state, aux = train_step_events(state, batch, kt, ss, opt)
        losses.append(float(aux["loss"]))

    assert np.mean(losses[-10:]) < 0.6 * np.mean(losses[:10]), (
        f"event loss did not decrease: {np.mean(losses[:10])} -> {np.mean(losses[-10:])}"
    )


def test_event_sampling_invariants():
    data = synthetic.simulate_events(H=32, W=32, n_frames=15, C=0.3, turns=0.3)
    chains, _ = build_event_chains(data["events"])
    key = jax.random.PRNGKey(0)

    s = sample_event_batch(key, chains, 0, 256)
    i0, i1 = np.asarray(s["idx_start"]), np.asarray(s["idx_end"])
    xs, ys, ts = np.asarray(chains.xs), np.asarray(chains.ys), np.asarray(chains.ts)
    assert (i1 == i0 + 1).all()
    assert (xs[i0] == xs[i1]).all() and (ys[i0] == ys[i1]).all(), "pair crosses pixels"
    assert (ts[i1] >= ts[i0]).all()
    np.testing.assert_array_equal(np.asarray(s["pols"]), np.asarray(chains.pols)[i1])

    sa = sample_event_batch(key, chains, 0, 256, accumulate=True, acc_max_num_evs=4)
    i0, i1 = np.asarray(sa["idx_start"]), np.asarray(sa["idx_end"])
    assert (i1 > i0).all()
    assert (xs[i0] == xs[i1]).all() and (ys[i0] == ys[i1]).all()
    # summed polarity matches direct sum
    pols = np.asarray(chains.pols)
    expect = np.asarray([pols[a + 1 : b + 1].sum() for a, b in zip(i0, i1)])
    np.testing.assert_allclose(np.asarray(sa["pols"]), expect, atol=1e-4)


def test_event_rays_match_frame_rays():
    """Event rays at integer pixel coords == full-image rays at that pixel."""
    H = W = 16
    intr = synthetic.default_intrinsics(H, W)
    pose = jnp.asarray(synthetic.circle_pose(0.1), jnp.float32)
    ro, rd = get_rays_full(pose, intr, H, W)

    xs = jnp.asarray([3.0, 10.0])
    ys = jnp.asarray([5.0, 12.0])
    p34 = jnp.broadcast_to(pose[:3, :4], (2, 3, 4))
    evr = get_event_rays(xs, ys, p34, p34, intr)
    for i, (x, y) in enumerate([(3, 5), (10, 12)]):
        pix = y * W + x
        np.testing.assert_allclose(evr["rays_evs_o1"][i], ro[pix], rtol=1e-5)
        np.testing.assert_allclose(evr["rays_evs_d1"][i], rd[pix], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("encoding", ["frequency", "none"])
def test_gridfree_encodings_train(encoding):
    """The grid-free encoders (reference encoding.py get_encoder: None /
    frequency) plug into the field and can fit a target."""
    import jax
    import jax.numpy as jnp
    import optax
    from enerf_tpu.models.field import (
        FieldStatic, field_forward, init_field_params,
    )

    static = FieldStatic(bound=1.0, encoding=encoding, out_dim_color=1)
    assert static.in_dim == (3 if encoding == "none" else 3 * 13)
    params = init_field_params(jax.random.PRNGKey(0), static)
    assert "hash_table" not in params

    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (256, 3), minval=-1.0, maxval=1.0)
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (256, 1))
    target = jnp.sin(3.0 * x[:, 0])  # smooth target

    opt = optax.adam(1e-2)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost):
        def loss_fn(p):
            sigma, _ = field_forward(p, static, x, d)
            return jnp.mean((jnp.log(sigma + 1e-6) - target) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, ost = opt.update(g, ost)
        return optax.apply_updates(params, up), ost, loss

    params, ost, l0 = step(params, ost)
    for _ in range(60):
        params, ost, loss = step(params, ost)
    assert float(loss) < 0.5 * float(l0)


def test_density_bias_opaque_init():
    """density_bias=3 makes the INITIAL field opaque (sigma0 ~ e^3) on both
    the unfused and fused heads — the carve-not-condense init option
    (ROUND2_STATUS.md mist analysis)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from enerf_tpu.models.field import (
        FieldStatic, init_field_params, field_density, field_forward_fused,
    )

    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3), minval=-0.9,
                           maxval=0.9)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (128, 1))
    for fused in (False, True):
        st0 = FieldStatic(bound=1.0, out_dim_color=1, num_levels=4,
                          log2_hashmap_size=10, encoding="blockgrid",
                          use_fused_head=fused)
        stb = FieldStatic(bound=1.0, out_dim_color=1, num_levels=4,
                          log2_hashmap_size=10, encoding="blockgrid",
                          use_fused_head=fused, density_bias=3.0)
        params = init_field_params(jax.random.PRNGKey(0), st0)
        if fused:
            s0 = np.asarray(field_forward_fused(params, st0, x, d)[0])
            sb = np.asarray(field_forward_fused(params, stb, x, d)[0])
        else:
            s0 = np.asarray(field_density(params, st0, x)[0])
            sb = np.asarray(field_density(params, stb, x)[0])
        ratio = np.median(sb / np.maximum(s0, 1e-12))
        np.testing.assert_allclose(ratio, np.exp(3.0), rtol=0.05)


@pytest.mark.slow
@pytest.mark.slow
def test_remat_fixed_grads_match():
    """warm_statics remats the fixed-step renderer (jax.checkpoint) to cut
    the warm program's peak AD-residual memory ~4x (the event loss issues
    four fixed-step renders with negative sampling on, which OOMed a 16 GB
    chip at the production batch).  Remat must not change the math: loss
    and every parameter gradient match the non-remat step."""
    from enerf_tpu.train.step import event_loss_fn, warm_statics

    static = tiny_static(out_dim_color=1)
    params = init_field_params(jax.random.PRNGKey(3), static)
    ss = StepStatics(
        field_static=static, num_steps=24, upsample_steps=0, min_near=0.2,
        density_scale=1.0, C_thres=0.2, event_only=True,
        use_luma=False, linlog=True, weight_loss_rgb=1.0,
        negative_event_sampling=True, w_no_ev=1.0, out_dim_color=1,
    )
    ssw = warm_statics(ss)
    assert ssw.remat_fixed and not ssw.use_march and not ssw.share_march

    key = jax.random.PRNGKey(11)
    ko, kd, kr = jax.random.split(key, 3)
    N = 64
    d = jax.random.normal(kd, (2 * N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (2 * N, 1))
    o = o + 0.01 * jax.random.normal(ko, (2 * N, 3))
    batch = {
        "rays_evs_o1": o[:N], "rays_evs_d1": d[:N],
        "rays_evs_o2": o[:N] + 0.005, "rays_evs_d2": d[:N],
        "pols": jnp.where(jnp.arange(N) % 2 == 0, 1.0, -1.0),
        "rays_no_evs_o1": o[N:], "rays_no_evs_d1": d[N:],
        "rays_no_evs_o2": o[N:] + 0.005, "rays_no_evs_d2": d[N:],
    }

    def run(s):
        (loss, _), grads = jax.value_and_grad(event_loss_fn, has_aux=True)(
            params, s, batch, kr)
        return loss, grads

    loss0, g0 = run(ss)
    for s in (ssw, ssw._replace(remat_fixed=2)):  # full remat + policy
        loss1, g1 = run(s)
        np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8),
            g0, g1)


def test_warmup_num_steps_applies_in_warm_phase_only():
    """--warmup_num_steps overrides the fixed-step sample count during the
    march_warmup phase only (the warmup renderer is encoder-gather bound,
    so a smaller count buys near-linear warmup speedup).  0 keeps
    num_steps; the non-warm statics must be untouched."""
    from enerf_tpu.train.step import event_loss_fn, warm_statics

    static = tiny_static(out_dim_color=1)
    ss = StepStatics(
        field_static=static, num_steps=24, upsample_steps=0, min_near=0.2,
        density_scale=1.0, C_thres=0.2, event_only=True,
        use_luma=False, linlog=True, weight_loss_rgb=1.0,
        negative_event_sampling=False, w_no_ev=1.0, out_dim_color=1,
        warmup_num_steps=8,
    )
    ssw = warm_statics(ss)
    assert ssw.num_steps == 8 and ss.num_steps == 24
    assert warm_statics(ss._replace(warmup_num_steps=0)).num_steps == 24

    # the reduced-count warm step still runs and produces finite grads
    params = init_field_params(jax.random.PRNGKey(3), static)
    key = jax.random.PRNGKey(11)
    ko, kd, kr = jax.random.split(key, 3)
    N = 32
    d = jax.random.normal(kd, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (N, 1))
    o = o + 0.01 * jax.random.normal(ko, (N, 3))
    batch = {
        "rays_evs_o1": o, "rays_evs_d1": d,
        "rays_evs_o2": o + 0.005, "rays_evs_d2": d,
        "pols": jnp.where(jnp.arange(N) % 2 == 0, 1.0, -1.0),
    }
    (loss, _), grads = jax.value_and_grad(event_loss_fn, has_aux=True)(
        params, ssw, batch, kr)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))
