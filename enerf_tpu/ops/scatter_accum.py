"""Pallas table-gradient accumulation for the block-packed encoder.

The block-grid backward is the framework's top kernel gap (BENCH_NOTES.md):
XLA lowers the gather's VJP to an HBM scatter-add at ~30 M rows/s — a
latency-bound random read-modify-write per 1 KB row.  The reference's CUDA
equivalent is the contended atomicAdd loop (gridencoder.cu:225-311).

TPU design: one level's gradient table fits in VMEM (<= 8192 rows x 256
f32 = 8.4 MB < 16 MB), so accumulation can be an on-chip read-modify-write:

  grid = (levels, sample_chunks)   # chunks sequential ("arbitrary")
  scratch acc[8192, 256] (VMEM)    # persists across a level's chunks
  per chunk: build the [B, 256] gradient rows from (g, lo, frac) on the
  VPU (trilinear weights from an iota, outer product with the 2 feature
  grads) and serially accumulate acc[rid[i]] += rows[i] with rid streamed
  through SMEM; write acc to HBM once per level.

HBM traffic becomes: meta stream (M x 32 B) + one table-sized write —
instead of M random 1 KB read-modify-writes.

The packed meta layout per (sample, level) is 8 f32 lanes:
  [lo_x, lo_y, lo_z, g_0, g_1, frac_x, frac_y, frac_z]
(integers carried as f32; exact below 2^24).
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from enerf_tpu.ops.blockgrid import BLOCK, HALO, ROW_CELLS

CHUNK = 1024         # samples per grid step


def _cell_pad(row_cells):
    # lane padding per channel plane: both channels share one 128-lane
    # plane when a block fits 64 lanes (block <= 3), else two planes
    return 64 if row_cells <= 64 else 128


def _make_kernel(halo, row_cells):
    cp_lanes = _cell_pad(row_cells)

    def _kernel(rid_ref, meta_ref, out_ref, acc_ref, rows_ref, sem):
        l = pl.program_id(0)
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _zero():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        meta = meta_ref[0]            # [CHUNK, 8] f32
        B = meta.shape[0]
        lo = meta[:, 0:3]             # [B, 3]
        g0 = meta[:, 3]
        g1 = meta[:, 4]
        frac = meta[:, 5:8]

        # per-cell trilinear weights W[b, p], p < row_cells (lanes padded)
        p = jax.lax.broadcasted_iota(jnp.int32, (B, cp_lanes), 1)
        px = (p // (halo * halo)).astype(jnp.float32)
        py = ((p // halo) % halo).astype(jnp.float32)
        pz = (p % halo).astype(jnp.float32)
        valid = (p < row_cells).astype(jnp.float32)

        def axis_w(pidx, d):
            l = lo[:, d][:, None]
            f = frac[:, d][:, None]
            return (jnp.where(pidx == l, 1.0 - f, 0.0)
                    + jnp.where(pidx == l + 1.0, f, 0.0))

        W = axis_w(px, 0) * axis_w(py, 1) * axis_w(pz, 2) * valid
        # rows: [B, 2*cp_lanes] — channel-planar row[c*row_cells+p]; lanes
        # >= row_cells are zero padding mapped onto zero columns by the
        # host-side depad.  Staged through a VMEM scratch so the serial
        # loop can dynamic-slice a ref (Mosaic has no dynamic_slice on
        # values).
        rows_ref[:] = jnp.concatenate(
            [g0[:, None] * W, g1[:, None] * W], axis=1)

        def body(i, _):
            r = rid_ref[0, 0, i // 128, i % 128]
            acc_ref[pl.ds(r, 1), :] += rows_ref[pl.ds(i, 1), :]
            return _

        jax.lax.fori_loop(0, B, body, 0)

        @pl.when(j == nj - 1)
        def _flush():
            # out lives in HBM (a VMEM out block would blow the 16 MB
            # budget next to the accumulator); one explicit DMA per level
            dma = pltpu.make_async_copy(acc_ref, out_ref.at[l], sem)
            dma.start()
            dma.wait()

    return _kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_levels", "rows_max", "halo", "row_cells"))
def block_table_grad_pallas(rid, meta, n_levels, rows_max=8192, halo=HALO,
                            row_cells=ROW_CELLS):
    """Accumulate per-level gradient tables.

    rid: [L, M] int32 row ids (invalid lanes -> rows_max - 1 with zero g).
    meta: [L, M, 8] f32 packed (lo, g, frac).
    Returns [L, rows_max, 2 * cell_pad] f32.
    """
    L, M = rid.shape
    width = 2 * _cell_pad(row_cells)
    nj = -(-M // CHUNK)
    pad = nj * CHUNK - M
    if pad:
        rid = jnp.pad(rid, ((0, 0), (0, pad)), constant_values=rows_max - 1)
        meta = jnp.pad(meta, ((0, 0), (0, pad), (0, 0)))
    # SMEM blocks need (8, 128)-aligned trailing dims: carry the chunk's
    # row ids as an [8, 128] tile
    rid = rid.reshape(L, nj, 8, CHUNK // 8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(L, nj),
        in_specs=[
            pl.BlockSpec((1, 1, 8, CHUNK // 8), lambda l, j: (l, j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CHUNK, 8), lambda l, j: (l, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((rows_max, width), jnp.float32),
                        pltpu.VMEM((CHUNK, width), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _make_kernel(halo, row_cells),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, rows_max, width), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=os.environ.get("ENERF_TPU_INTERPRET", "0") == "1",
    )(rid, meta)


def block_table_grad_reference(rid, meta, total_rows, offsets,
                               halo=HALO, row_cells=ROW_CELLS):
    """jnp oracle: the same accumulation via XLA scatter-add.

    Returns the flat [total_rows, row_cells*2] gradient (depadded).
    """
    L, M = rid.shape
    lo = meta[..., 0:3]
    g = meta[..., 3:5]
    frac = meta[..., 5:8]
    p = np.arange(row_cells)
    pxs = jnp.asarray(p // (halo * halo), jnp.float32)
    pys = jnp.asarray((p // halo) % halo, jnp.float32)
    pzs = jnp.asarray(p % halo, jnp.float32)

    def axis_w(pidx, d):
        l = lo[..., d][..., None]
        f = frac[..., d][..., None]
        return (jnp.where(pidx == l, 1.0 - f, 0.0)
                + jnp.where(pidx == l + 1.0, f, 0.0))

    W = axis_w(pxs, 0) * axis_w(pys, 1) * axis_w(pzs, 2)  # [L, M, RC]
    rows = jnp.concatenate(
        [g[..., 0:1] * W, g[..., 1:2] * W], axis=-1)  # [L, M, 2*RC]
    flat_id = rid + jnp.asarray(offsets, jnp.int32)[:, None]
    out = jnp.zeros((total_rows, 2 * row_cells), jnp.float32)
    return out.at[flat_id.reshape(-1)].add(rows.reshape(L * M, -1),
                                           mode="drop")


def depad_level_grads(per_level, meta_obj):
    """Kernel output -> flat [total_rows, row_cells*2] gradient."""
    L = per_level.shape[0]
    rc = meta_obj.row_cells
    cp = _cell_pad(rc)
    parts = []
    for l in range(L):
        rows_l = int(meta_obj.n_rows[l])
        gl = per_level[l, :rows_l]
        parts.append(jnp.concatenate(
            [gl[:, :rc], gl[:, cp:cp + rc]], axis=1))
    return jnp.concatenate(parts, axis=0)


# ----------------------------------------------------------------------------
# custom-VJP encoder wrapper using the kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def block_encode_fast(x01, table, meta):
    """block_encode with the Pallas VMEM-accumulation table backward.

    Contract: gradients w.r.t. POSITIONS are zero (the training graph
    never needs them — rays are data, not parameters; use plain
    block_encode / hashgrid for pose-refinement workloads).
    """
    from enerf_tpu.ops.blockgrid import block_encode
    return block_encode(x01, table, meta)


def _bef_fwd(x01, table, meta):
    from enerf_tpu.ops.blockgrid import block_encode
    return block_encode(x01, table, meta), x01


def _bef_bwd(meta, x01, g_out):
    from enerf_tpu.ops.blockgrid import block_address
    assert meta.level_dim == 2, "fast backward supports level_dim == 2"
    N = x01.shape[0]
    L = meta.num_levels
    x = jnp.clip(x01.astype(jnp.float32), 0.0, 1.0)
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)
    rid, lo, frac = block_address(x, meta)
    g = jnp.where(oob[:, None, None], 0.0,
                  g_out.reshape(N, L, 2).astype(jnp.float32))
    meta8 = jnp.concatenate([lo.astype(jnp.float32), g, frac], axis=-1)
    # rows_max must be (8,128)-tile aligned for the kernel's HBM slices
    # (Mosaic rejects sub-tile sublane slicing; e.g. 16x2 blk4 has 8388-row
    # levels) — round up; pad rows absorb only zero-g sentinel lanes and
    # are dropped by depad_level_grads.
    rows_max = -(-int(meta.n_rows.max()) // 8) * 8
    per_level = block_table_grad_pallas(
        rid.T, jnp.transpose(meta8, (1, 0, 2)), L,
        rows_max=rows_max, halo=meta.halo,
        row_cells=meta.row_cells)
    gtab = depad_level_grads(per_level, meta)
    return jnp.zeros_like(x01), gtab


block_encode_fast.defvjp(_bef_fwd, _bef_bwd)
