"""Tests for the block-packed TPU-fast grid encoder."""

import numpy as np
import jax
import jax.numpy as jnp

from enerf_tpu.ops.blockgrid import (
    BLOCK, HALO, ROW_CELLS, BlockGridMeta, block_encode, init_block_table,
)


def small_meta(**kw):
    kw.setdefault("num_levels", 4)
    kw.setdefault("base_resolution", 4)
    kw.setdefault("desired_resolution", 32)
    kw.setdefault("log2_hashmap_size", 9)  # forces hashing on upper levels
    return BlockGridMeta(**kw)


def oracle_encode(x01, table, meta):
    """Scalar-loop trilinear interpolation through the block-row layout."""
    PRIMES = (1, 2654435761, 805459861)
    N = x01.shape[0]
    L, C = meta.num_levels, meta.level_dim
    out = np.zeros((N, L, C))
    tab = np.asarray(table, np.float64)
    for n in range(N):
        if np.any((x01[n] < 0) | (x01[n] > 1)):
            continue
        for lvl in range(L):
            pos = x01[n].astype(np.float32) * meta.scales[lvl] + 0.5
            pg = np.floor(pos).astype(np.int64)
            frac = pos - pg
            b = pg // BLOCK
            lo = pg - b * BLOCK
            nb = int(meta.nbs[lvl])
            if meta.hashed[lvl]:
                h = 0
                for d in range(3):
                    h ^= (int(np.uint32(b[d])) * PRIMES[d]) % (2 ** 32)
                rid = (h % (2 ** 32)) % int(meta.n_rows[lvl])
            else:
                rid = (b[0] * nb + b[1]) * nb + b[2]
            # channel-planar row layout: row[c*125 + (px*5+py)*5+pz]
            row = tab[int(meta.offsets[lvl]) + rid].reshape(C, HALO, HALO, HALO)
            for c in range(8):
                w = 1.0
                o = np.zeros(3, np.int64)
                for d in range(3):
                    bit = (c >> d) & 1
                    w *= frac[d] if bit else 1.0 - frac[d]
                    o[d] = lo[d] + bit
                out[n, lvl] += w * row[:, o[0], o[1], o[2]]
    return out.reshape(N, L * C)


def test_block_encode_matches_oracle():
    meta = small_meta()
    assert meta.hashed.any() and (~meta.hashed).any(), "want mixed dense+hashed"
    table = init_block_table(jax.random.PRNGKey(0), meta)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    x = x.at[0].set(jnp.asarray([1.2, 0.5, 0.5]))  # oob
    out = np.asarray(block_encode(x, table, meta))
    ref = oracle_encode(np.asarray(x), np.asarray(table), meta)
    np.testing.assert_allclose(out, ref, atol=1e-7)
    assert (out[0] == 0).all()


def test_block_encode_exact_at_cell_corners():
    """At integer cell positions the encoding equals the stored cell value."""
    meta = BlockGridMeta(num_levels=1, base_resolution=8,
                         desired_resolution=8, log2_hashmap_size=19)
    table = init_block_table(jax.random.PRNGKey(0), meta)
    # pos = x*scale + 0.5 = integer k  =>  x = (k - 0.5)/scale
    scale = float(meta.scales[0])
    ks = np.asarray([1, 3, 5])
    x = np.stack(np.meshgrid(ks, ks, ks, indexing="ij"), -1).reshape(-1, 3)
    x01 = (x - 0.5) / scale
    out = np.asarray(block_encode(jnp.asarray(x01, jnp.float32), table, meta))
    ref = oracle_encode(x01.astype(np.float32), np.asarray(table), meta)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_block_encode_grads_flow():
    meta = small_meta()
    table = init_block_table(jax.random.PRNGKey(0), meta)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))

    g = jax.grad(lambda t: jnp.sum(block_encode(x, t, meta) ** 2))(table)
    g = np.asarray(g)
    assert np.isfinite(g).all() and (g != 0).any()

    gx = jax.grad(lambda xx: jnp.sum(block_encode(xx, table, meta)))(x)
    assert np.isfinite(np.asarray(gx)).all()


def test_block_field_training_converges():
    """End-to-end: the blockgrid field trains to the same quality bar as the
    per-cell hash field on the synthetic scene."""
    from enerf_tpu.models.field import FieldStatic, init_field_params
    from enerf_tpu.data import synthetic
    from enerf_tpu.data.rays import get_rays_sampled, get_rays_full
    from enerf_tpu.render.renderer import render_rays
    from enerf_tpu.train.state import init_train_state
    from enerf_tpu.train.step import StepStatics, train_step_frames
    from enerf_tpu.train.metrics import psnr

    H = W = 32
    intr = synthetic.default_intrinsics(H, W)
    poses = [synthetic.circle_pose(t) for t in np.linspace(0, 0.5, 4)]
    gts = [synthetic.render_gt(p, intr, H, W, with_alpha=True) for p in poses]

    static = FieldStatic(
        bound=1.0, out_dim_color=3, num_levels=8, log2_hashmap_size=13,
        encoding="blockgrid",
    )
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

    key = jax.random.PRNGKey(0)
    losses = []
    for it in range(150):
        key, k2, k3 = jax.random.split(key, 3)
        pi = it % 4
        rays = get_rays_sampled(k2, poses_j[pi], intr, H, W, 256)
        batch = {"rays_o": rays["rays_o"], "rays_d": rays["rays_d"],
                 "images": gts_j[pi][rays["inds"]]}
        state, aux = train_step_frames(state, batch, k3, ss, opt)
        losses.append(float(aux["loss"]))
    assert np.mean(losses[-10:]) < 0.3 * np.mean(losses[:10])

    ro, rd = get_rays_full(poses_j[0], intr, H, W)
    out = render_rays(state.ema_params, static, ro, rd, num_steps=48,
                      bg_color=1.0, perturb=False, train=False)
    gtw = synthetic.render_gt(poses[0], intr, H, W)
    p = psnr(np.asarray(out["image"]).reshape(H, W, 3), gtw)
    flat = psnr(np.full_like(gtw, gtw.mean()), gtw)
    assert p > flat + 2.0, f"blockgrid PSNR {p:.2f} vs flat {flat:.2f}"
