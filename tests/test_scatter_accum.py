"""Pallas VMEM-accumulation table backward vs autodiff (interpret on CPU).

The fast path replaces XLA's HBM scatter-add (the analogue of the CUDA
atomicAdd loop, gridencoder.cu:225-311) with on-chip accumulation; its
gradient must equal the plain autodiff gradient exactly (same f32 math).
"""

import numpy as np
import jax
import jax.numpy as jnp

from enerf_tpu.ops.blockgrid import (
    BlockGridMeta, init_block_table, block_encode, block_address,
)
from enerf_tpu.ops.scatter_accum import (
    block_table_grad_pallas, block_table_grad_reference, depad_level_grads,
    block_encode_fast,
)


def _setup(n=257):
    meta = BlockGridMeta(num_levels=4, level_dim=2, base_resolution=16,
                         log2_hashmap_size=16, desired_resolution=256)
    table = init_block_table(jax.random.PRNGKey(0), meta)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    g_out = jax.random.normal(jax.random.PRNGKey(2), (n, meta.num_levels * 2))
    return meta, table, x, g_out


def test_kernel_matches_autodiff_table_grad():
    meta, table, x, g_out = _setup()
    _, vjp = jax.vjp(lambda t: block_encode(x, t, meta), table)
    gt = vjp(g_out)[0]

    rid, lo, frac = block_address(x, meta)
    L = meta.num_levels
    meta8 = jnp.concatenate(
        [lo.astype(jnp.float32), g_out.reshape(-1, L, 2), frac], axis=-1)
    ref = block_table_grad_reference(
        rid.T, jnp.transpose(meta8, (1, 0, 2)), meta.total_rows,
        meta.offsets[:-1])
    np.testing.assert_allclose(np.asarray(ref), np.asarray(gt), atol=1e-5)

    out = block_table_grad_pallas(rid.T, jnp.transpose(meta8, (1, 0, 2)), L)
    flat = depad_level_grads(out, meta)
    np.testing.assert_allclose(np.asarray(flat), np.asarray(gt), atol=1e-5)


def test_block_encode_fast_forward_and_grad():
    meta, table, x, g_out = _setup()
    # out-of-bounds samples must contribute zero gradient, like the slow path
    x = x.at[:16].set(x[:16] + 2.0)

    y_fast = block_encode_fast(x, table, meta)
    y_slow = block_encode(x, table, meta)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_slow), atol=1e-6)

    loss = lambda enc_fn: (lambda t: jnp.sum(enc_fn(x, t, meta) * g_out))
    g_fast = jax.grad(loss(block_encode_fast))(table)
    g_slow = jax.grad(loss(block_encode))(table)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_slow), atol=1e-5)


def test_field_level_fast_grad_parity():
    from enerf_tpu.models.field import FieldStatic, init_field_params, field_density

    grads = {}
    for ff in (True, False):
        static = FieldStatic(bound=1.0, out_dim_color=1, num_levels=4,
                             log2_hashmap_size=12, encoding="blockgrid",
                             fast_table_grad=ff)
        params = init_field_params(jax.random.PRNGKey(0), static)
        x = jax.random.uniform(jax.random.PRNGKey(1), (200, 3), minval=-1, maxval=1)
        g = jax.grad(lambda p: jnp.sum(field_density(p, static, x)[0] ** 2))(params)
        grads[ff] = np.asarray(g["hash_table"])
    np.testing.assert_allclose(grads[True], grads[False], atol=1e-5)


def test_block3_geometry_kernel_and_encode():
    """block=3 (64-cell rows, 512 B): forward oracle + fast-grad parity."""
    meta = BlockGridMeta(num_levels=4, level_dim=2, base_resolution=16,
                         log2_hashmap_size=16, desired_resolution=256,
                         block=3)
    assert meta.row_cells == 64
    table = init_block_table(jax.random.PRNGKey(0), meta)
    n = 211
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    g_out = jax.random.normal(jax.random.PRNGKey(2), (n, meta.num_levels * 2))

    # forward at exact corner points must read back exact table values:
    # handled by the generic oracle in test_blockgrid; here check fwd
    # equality between block sizes is NOT expected, but grads must match
    # autodiff for the same geometry
    _, vjp = jax.vjp(lambda t: block_encode(x, t, meta), table)
    gt = vjp(g_out)[0]
    g_fast = jax.grad(
        lambda t: jnp.sum(block_encode_fast(x, t, meta) * g_out))(table)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(gt), atol=1e-5)

    # field-level: block=3 trains (loss drops) like block=4
    from enerf_tpu.models.field import FieldStatic, init_field_params, field_density
    static = FieldStatic(bound=1.0, out_dim_color=1, num_levels=4,
                         log2_hashmap_size=12, encoding="blockgrid",
                         grid_block=3)
    params = init_field_params(jax.random.PRNGKey(0), static)
    xs = jax.random.uniform(jax.random.PRNGKey(3), (128, 3), minval=-1, maxval=1)
    sig, _ = field_density(params, static, xs)
    assert np.isfinite(np.asarray(sig)).all()


def test_unaligned_level_rows_16x2_blk4():
    """The production 16x2 blk4 shape has 8388-row levels (not mod-8).

    Mosaic requires (8,128)-tile-aligned HBM slices, so the kernel's
    rows_max must be rounded up — this shape crashed the remote compile
    before the round-4 fix (bench.py --fast_table_grad at the reference
    shape).  Grad must still match autodiff exactly."""
    meta = BlockGridMeta(num_levels=16, level_dim=2, block=4)
    assert int(meta.n_rows.max()) % 8 != 0  # the regression precondition
    table = init_block_table(jax.random.PRNGKey(0), meta)
    n = 257
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    g_out = jax.random.normal(jax.random.PRNGKey(2), (n, meta.num_levels * 2))
    _, vjp = jax.vjp(lambda t: block_encode(x, t, meta), table)
    gt = vjp(g_out)[0]
    g_fast = jax.grad(
        lambda t: jnp.sum(block_encode_fast(x, t, meta) * g_out))(table)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(gt), atol=1e-5)
