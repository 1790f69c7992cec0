"""Unit tests for core ops against independent numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from enerf_tpu.ops.trunc_exp import trunc_exp
from enerf_tpu.ops.sh import sh_encode
from enerf_tpu.ops.hashgrid import HashGridMeta, hash_encode, init_hash_table
from enerf_tpu.ops.aabb import near_far_from_aabb, polar_from_ray
from enerf_tpu.ops.composite import composite_rays
from enerf_tpu.ops.morton import morton3d, morton3d_invert, packbits

from oracles import hash_encode_oracle, composite_oracle


def test_trunc_exp_forward_backward():
    x = jnp.asarray([-20.0, -1.0, 0.0, 1.0, 20.0])
    y = trunc_exp(x)
    np.testing.assert_allclose(y, np.exp(np.asarray(x)), rtol=1e-6)
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    expected = np.exp(np.clip(np.asarray(x), -15, 15))
    np.testing.assert_allclose(g, expected, rtol=1e-6)


def test_sh_degree4_known_directions():
    # +z axis: only the m=0 terms are nonzero
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    enc = np.asarray(sh_encode(d, 4))[0]
    assert enc.shape == (16,)
    np.testing.assert_allclose(enc[0], 0.28209479177387814, rtol=1e-6)
    np.testing.assert_allclose(enc[2], 0.48860251190291987, rtol=1e-6)
    np.testing.assert_allclose(enc[6], 0.94617469575755997 - 0.31539156525251999, rtol=1e-5)
    np.testing.assert_allclose(enc[12], 0.3731763325901154 * 2.0, rtol=1e-5)
    assert abs(enc[1]) < 1e-7 and abs(enc[3]) < 1e-7 and abs(enc[4]) < 1e-7


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 6, 7, 8])
def test_sh_shapes_all_degrees(degree):
    d = jax.random.normal(jax.random.PRNGKey(0), (32, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    enc = sh_encode(d, degree)
    assert enc.shape == (32, degree * degree)
    assert np.isfinite(np.asarray(enc)).all()


def test_sh_orthonormality_montecarlo():
    # Real SH are orthonormal over the sphere: E[Y_i Y_j] = delta_ij / (4*pi).
    key = jax.random.PRNGKey(1)
    d = jax.random.normal(key, (200000, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    Y = np.asarray(sh_encode(d, 4), np.float64)  # [N, 16]
    gram = (Y.T @ Y) / Y.shape[0] * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(16), atol=0.15)


@pytest.mark.parametrize("gridtype", ["hash", "tiled"])
def test_hash_encode_matches_oracle(gridtype):
    meta = HashGridMeta(
        input_dim=3, num_levels=6, level_dim=2, base_resolution=4,
        log2_hashmap_size=7, desired_resolution=64, gridtype=gridtype,
    )
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, meta)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    # include some out-of-bounds points
    x = x.at[0].set(jnp.asarray([-0.1, 0.5, 0.5]))
    x = x.at[1].set(jnp.asarray([0.5, 1.2, 0.5]))
    out = np.asarray(hash_encode(x, table, meta))
    ref = hash_encode_oracle(np.asarray(x), np.asarray(table), meta)
    np.testing.assert_allclose(out, ref, atol=1e-7)
    assert np.all(out[0] == 0) and np.all(out[1] == 0)


def test_hash_encode_2d():
    meta = HashGridMeta(
        input_dim=2, num_levels=4, level_dim=2, base_resolution=4,
        log2_hashmap_size=6, desired_resolution=32,
    )
    table = init_hash_table(jax.random.PRNGKey(0), meta)
    x = jax.random.uniform(jax.random.PRNGKey(2), (32, 2))
    out = np.asarray(hash_encode(x, table, meta))
    ref = hash_encode_oracle(np.asarray(x), np.asarray(table), meta)
    np.testing.assert_allclose(out, ref, atol=1e-7)


def test_hash_encode_table_grad_is_scatter_add():
    meta = HashGridMeta(
        input_dim=3, num_levels=4, level_dim=2, base_resolution=4,
        log2_hashmap_size=6, desired_resolution=32,
    )
    table = init_hash_table(jax.random.PRNGKey(0), meta)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))

    def loss(tab):
        return jnp.sum(hash_encode(x, tab, meta) ** 2)

    g = jax.grad(loss)(table)
    # numeric check on a few entries
    eps = 1e-4
    rng = np.random.default_rng(0)
    idxs = rng.integers(0, table.shape[0], 5)
    for i in idxs:
        for c in range(meta.level_dim):
            tp = table.at[i, c].add(eps)
            tm = table.at[i, c].add(-eps)
            fd = (loss(tp) - loss(tm)) / (2 * eps)
            np.testing.assert_allclose(g[i, c], fd, rtol=2e-2, atol=2e-4)


def test_hash_encode_input_grad_exists():
    meta = HashGridMeta(
        input_dim=3, num_levels=4, level_dim=2, base_resolution=4,
        log2_hashmap_size=6, desired_resolution=32,
    )
    table = init_hash_table(jax.random.PRNGKey(0), meta)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=0.2, maxval=0.8)
    g = jax.grad(lambda xx: jnp.sum(hash_encode(xx, table, meta)))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_near_far_from_aabb():
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    o = jnp.asarray([[0.0, 0, -3], [0, 0, -3], [5, 5, 5]])
    d = jnp.asarray([[0.0, 0, 1], [0, 1, 0], [1, 0, 0]])
    near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
    np.testing.assert_allclose(near[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(far[0], 4.0, rtol=1e-6)
    assert near[1] > 1e30 and far[1] > 1e30  # miss
    assert near[2] > 1e30  # behind
    # ray starting inside: near clamps to min_near
    near2, far2 = near_far_from_aabb(
        jnp.asarray([[0.0, 0, 0]]), jnp.asarray([[0.0, 0, 1]]), aabb, 0.2
    )
    np.testing.assert_allclose(near2[0], 0.2, rtol=1e-6)
    np.testing.assert_allclose(far2[0], 1.0, rtol=1e-6)


def test_polar_from_ray_range():
    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (64, 3), minval=-0.5, maxval=0.5)
    d = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    p = np.asarray(polar_from_ray(o, d, 4.0))
    assert p.shape == (64, 2)
    assert (p >= -1.0 - 1e-5).all() and (p <= 1.0 + 1e-5).all()


def test_composite_matches_oracle():
    rng = np.random.default_rng(0)
    N, T, C = 5, 16, 3
    sigmas = rng.uniform(0, 20, (N, T)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (N, T, C)).astype(np.float32)
    z = np.sort(rng.uniform(0.2, 3.0, (N, T)), axis=-1).astype(np.float32)
    deltas = np.diff(z, axis=-1)
    deltas = np.concatenate([deltas, 0.1 * np.ones((N, 1), np.float32)], -1)
    nears = z[:, 0]
    fars = z[:, -1] + 0.1
    bg = rng.uniform(0, 1, (N, C)).astype(np.float32)

    out = composite_rays(
        jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(deltas),
        jnp.asarray(z), jnp.asarray(nears), jnp.asarray(fars), jnp.asarray(bg),
        density_scale=1.3,
    )
    img_ref, depth_ref, ws_ref = composite_oracle(
        sigmas, rgbs, deltas, z, nears, fars, bg, density_scale=1.3
    )
    np.testing.assert_allclose(out["image"], img_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["depth"], depth_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["weights_sum"], ws_ref, rtol=1e-4, atol=1e-5)


def test_composite_differentiable():
    N, T = 4, 8
    key = jax.random.PRNGKey(0)
    sigmas = jax.random.uniform(key, (N, T), minval=0.0, maxval=5.0)
    rgbs = jax.random.uniform(jax.random.PRNGKey(1), (N, T, 3))
    z = jnp.sort(jax.random.uniform(jax.random.PRNGKey(2), (N, T), minval=0.2, maxval=2.0), -1)
    deltas = jnp.concatenate([jnp.diff(z, axis=-1), 0.1 * jnp.ones((N, 1))], -1)

    def loss(s):
        out = composite_rays(s, rgbs, deltas, z, z[:, 0], z[:, -1] + 0.1, 1.0)
        return jnp.sum(out["image"] ** 2)

    g = jax.grad(loss)(sigmas)
    assert np.isfinite(np.asarray(g)).all()


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    coords = rng.integers(0, 128, (256, 3)).astype(np.int32)
    codes = morton3d(jnp.asarray(coords))
    back = np.asarray(morton3d_invert(codes))
    np.testing.assert_array_equal(back, coords)
    # morton codes of 128^3 coords are unique and < 128^3
    assert np.asarray(codes).max() < 128 ** 3


def test_packbits():
    grid = jnp.asarray(np.arange(16, dtype=np.float32).reshape(2, 8))
    bits = np.asarray(packbits(grid, 5.0))
    # first byte: cells 0..7, values 0..7 -> cells 6,7 above 5.0
    assert bits[0] == (1 << 6) | (1 << 7)
    assert bits[1] == 0xFF
