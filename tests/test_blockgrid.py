"""Tests for the block-packed TPU-fast grid encoder."""

import numpy as np
import pytest
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

    # independent of the oracle (a shared addressing bug would fool the
    # comparison above): at frac == 0 the encoding must equal the STORED
    # table entry at the addressed row/cell, computed here from scratch
    B, HA, RC, C = meta.block, meta.halo, meta.row_cells, meta.level_dim
    assert not meta.hashed[0], "corner test assumes the dense level"
    pg = x.astype(np.int64)  # pos = x01*scale + 0.5 == x exactly
    b, lo = pg // B, pg % B
    nb = int(meta.nbs[0])
    rid = ((b[:, 0] * nb + b[:, 1]) * nb + b[:, 2]) + int(meta.offsets[0])
    p = (lo[:, 0] * HA + lo[:, 1]) * HA + lo[:, 2]
    tab = np.asarray(table)
    expect = np.stack([tab[rid, c * RC + p] for c in range(C)], -1)
    np.testing.assert_allclose(out.reshape(len(x), C), expect, atol=1e-7)


def test_block_encode_grads_flow():
    meta = small_meta()
    table = init_block_table(jax.random.PRNGKey(0), meta)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))

    g = jax.grad(lambda t: jnp.sum(block_encode(x, t, meta) ** 2))(table)
    g = np.asarray(g)
    assert np.isfinite(g).all() and (g != 0).any()

    gx = jax.grad(lambda xx: jnp.sum(block_encode(xx, table, meta)))(x)
    assert np.isfinite(np.asarray(gx)).all()


@pytest.mark.slow
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


def test_block_encode_bf16_forward_and_f32_backward():
    """block_encode_bf16: forward == block_encode on a bf16 table copy
    (within bf16 tol), table gradient EXACTLY the f32 scatter of the plain
    path, position grads zero by contract, chunked path consistent."""
    from enerf_tpu.ops.blockgrid import block_encode_bf16

    meta = small_meta()
    key = jax.random.PRNGKey(0)
    table = init_block_table(key, meta) * 1e4  # O(1) values so bf16 tol is visible
    n = 257
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-0.1, maxval=1.1)

    out = block_encode_bf16(x, table, meta)
    ref = block_encode(x, table.astype(jnp.bfloat16), meta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-2)

    def loss_bf16(t, xx):
        return jnp.sum(jnp.sin(block_encode_bf16(xx, t, meta)))

    def loss_f32(t, xx):
        return jnp.sum(jnp.sin(block_encode(xx, t, meta)))

    g_bf16 = jax.grad(loss_bf16, argnums=(0, 1))(table, x)
    g_f32 = jax.grad(loss_f32, argnums=(0, 1))(table, x)
    # cotangents differ slightly (cos of bf16 vs f32 forward), so compare
    # loosely in value but exactly in sparsity structure
    nz_b = np.asarray(g_bf16[0]) != 0
    nz_f = np.asarray(g_f32[0]) != 0
    assert (nz_b == nz_f).all(), "table-grad sparsity differs"
    np.testing.assert_allclose(np.asarray(g_bf16[0]), np.asarray(g_f32[0]),
                               rtol=5e-2, atol=5e-3)
    assert np.asarray(g_bf16[0]).dtype == np.float32
    assert not np.asarray(g_bf16[1]).any(), "position grads must be zero"

    # identical cotangent -> gradient matches the hand scatter bit-for-bit
    g_const = jax.grad(lambda t: jnp.sum(block_encode_bf16(x, t, meta)))(table)
    g_ref = jax.grad(lambda t: jnp.sum(block_encode(x, t, meta)))(table)
    np.testing.assert_allclose(np.asarray(g_const), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)

    # chunked backward path (> point_chunk samples per chunk boundary)
    xl = jax.random.uniform(jax.random.PRNGKey(2), (1100, 3))
    from enerf_tpu.ops import blockgrid as bg
    g_chunk = bg._beb_bwd(meta, xl, jnp.ones((1100, meta.output_dim)),
                          point_chunk=256)[1]
    g_full = bg._beb_bwd(meta, xl, jnp.ones((1100, meta.output_dim)))[1]
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_full),
                               rtol=1e-5, atol=1e-7)


def test_segsum_backward_matches_autodiff():
    """block_encode_segsum (sort + prefix-sum segment reduce + sorted-
    unique scatter) must reproduce block_encode's autodiff table gradient
    AND the exact position gradient (reference dy_dx role,
    gridencoder.cu:176-221), on both the single- and multi-chunk paths."""
    from enerf_tpu.ops.blockgrid import (
        BlockGridMeta, init_block_table, block_encode, block_encode_segsum,
    )

    meta = BlockGridMeta(num_levels=4, level_dim=2, log2_hashmap_size=12,
                         desired_resolution=128, block=3)
    tbl = init_block_table(jax.random.PRNGKey(0), meta)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2048, 3),
                           minval=-0.1, maxval=1.1)  # includes oob
    ct = jax.random.normal(jax.random.PRNGKey(2), (2048, meta.output_dim))

    np.testing.assert_allclose(
        np.asarray(block_encode_segsum(x, tbl, meta)),
        np.asarray(block_encode(x, tbl, meta)), atol=0)

    g_ref = jax.grad(lambda t: jnp.sum(block_encode(x, t, meta) * ct))(tbl)
    g_new = jax.grad(
        lambda t: jnp.sum(block_encode_segsum(x, t, meta) * ct))(tbl)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)

    dx_ref = jax.grad(lambda xx: jnp.sum(block_encode(xx, tbl, meta) * ct))(x)
    dx_new = jax.grad(
        lambda xx: jnp.sum(block_encode_segsum(xx, tbl, meta, True) * ct))(x)
    np.testing.assert_allclose(np.asarray(dx_new), np.asarray(dx_ref),
                               atol=1e-4, rtol=1e-4)
    # contract: without compute_dx the position grads are exact zeros
    dx0 = jax.grad(
        lambda xx: jnp.sum(block_encode_segsum(xx, tbl, meta, False) * ct))(x)
    assert np.all(np.asarray(dx0) == 0.0)

    # multi-chunk path (forces the scan accumulation)
    xb = jax.random.uniform(jax.random.PRNGKey(3), (3000, 3))
    ctb = jax.random.normal(jax.random.PRNGKey(4), (3000, meta.output_dim))
    import functools
    gb_ref = jax.grad(lambda t: jnp.sum(
        block_encode(xb, t, meta, point_chunk=1024) * ctb))(tbl)
    from enerf_tpu.ops import blockgrid as BG
    gb_new = BG._bes_bwd(meta, False, (xb, None),
                         ctb.reshape(3000, meta.output_dim),
                         point_chunk=1024)[1]
    np.testing.assert_allclose(np.asarray(gb_new), np.asarray(gb_ref),
                               atol=1e-4, rtol=1e-4)


def test_run_merge_preserves_sums():
    """_run_merge: arbitrary key streams — merged rows + survivors must
    scatter-add to exactly the same table as the raw stream."""
    from enerf_tpu.ops.blockgrid import _run_merge

    rng = np.random.RandomState(0)
    M, D, R = 64, 5, 7
    # runs of random lengths over R keys (ray-like), plus sentinel pads
    keys = np.repeat(rng.randint(0, R, size=20), rng.randint(1, 8, size=20))[:M]
    keys = np.pad(keys, (0, M - len(keys)), constant_values=R).astype(np.int32)
    rows = rng.randn(M, D).astype(np.float32)
    rows[keys == R] = 0.0
    mrows, mkeys = _run_merge(jnp.asarray(rows), jnp.asarray(keys),
                              jnp.int32(R), rounds=3)
    ref = np.zeros((R + 1, D), np.float32)
    np.add.at(ref, keys, rows)
    got = np.zeros((R + 1, D), np.float32)
    np.add.at(got, np.asarray(mkeys), np.asarray(mrows))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # the merge must actually merge: fewer live rows than inputs
    assert int(np.sum(np.asarray(mkeys) != R)) < int(np.sum(keys != R))


def test_mxu_encode_matches_block_encode():
    """block_encode_mxu: forward must be EXACTLY block_encode (one-hot
    matmul of exact 0/1 in f32); the table VJP matches autodiff up to f32
    reassociation noise, on a ray-ordered stream (real run structure)."""
    from enerf_tpu.ops.blockgrid import (
        BlockGridMeta, init_block_table, block_encode, block_encode_mxu,
    )

    meta = BlockGridMeta(num_levels=5, level_dim=2, log2_hashmap_size=14,
                         desired_resolution=256, block=3)
    # want all three routes: matmul (small dense), gather+scatter (hashed)
    assert (meta.n_rows <= 256).any() and (meta.n_rows > 256).any()
    tbl = init_block_table(jax.random.PRNGKey(0), meta)

    # ray-ordered positions: 32 rays x 64 samples marching through the box
    n_rays, S = 32, 64
    o = jax.random.uniform(jax.random.PRNGKey(1), (n_rays, 1, 3),
                           minval=0.05, maxval=0.3)
    d = jax.random.normal(jax.random.PRNGKey(2), (n_rays, 1, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.linspace(0.0, 0.9, S)[None, :, None]
    x = (o + jnp.abs(d) * t).reshape(-1, 3)   # stays mostly in [0, 1]
    ct = jax.random.normal(jax.random.PRNGKey(3),
                           (x.shape[0], meta.output_dim))

    for mxu_rows, rounds in ((256, 3), (256, 0), (0, 3)):
        out = block_encode_mxu(x, tbl, meta, mxu_rows, rounds)
        # same math; XLA fuses the 125-wide contraction differently around
        # the matmul vs the gather, so allow f32 reduction-order noise
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(block_encode(x, tbl, meta)),
                                   atol=1e-8, rtol=1e-5)
        g_ref = jax.grad(
            lambda t_: jnp.sum(block_encode(x, t_, meta) * ct))(tbl)
        g_new = jax.grad(lambda t_: jnp.sum(
            block_encode_mxu(x, t_, meta, mxu_rows, rounds) * ct))(tbl)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-4)
    # zero position grads by contract
    dx = jax.grad(
        lambda xx: jnp.sum(block_encode_mxu(xx, tbl, meta, 256, 3) * ct))(x)
    assert np.all(np.asarray(dx) == 0.0)

    # out-of-bounds rows must contribute nothing (parity with block_encode)
    xo = jnp.concatenate([x[:16], jnp.full((4, 3), 1.5)], 0)
    cto = ct[:20]
    go_ref = jax.grad(
        lambda t_: jnp.sum(block_encode(xo, t_, meta) * cto))(tbl)
    go_new = jax.grad(lambda t_: jnp.sum(
        block_encode_mxu(xo, t_, meta, 256, 3) * cto))(tbl)
    np.testing.assert_allclose(np.asarray(go_new), np.asarray(go_ref),
                               atol=1e-5, rtol=1e-5)
