"""Block-packed multiresolution grid encoding — the TPU-fast hash grid.

Motivation (measured on TPU v5e, see BENCH_NOTES.md): XLA's gather costs
~11 ns per row *independent of row width up to ~512 bytes* — fetching 2
floats costs the same as fetching 128.  The reference's per-cell hash layout
(gridencoder.cu) therefore runs ~100x below memory speed-of-light on TPU:
8 corner gathers x 16 levels per sample are pure address-generation stalls.

Design: cells are grouped into 4x4x4 blocks stored as one table row of
5x5x5 = 125 cells (a one-cell halo), so EVERY sample's 8 trilinear corners
live inside a single row: ONE gather per sample per level.  Trilinear
interpolation becomes a separable contraction (three [5]-vectors outer
product against the row) that runs on the VPU/MXU instead of the address
unit.  The backward pass is the gather's scatter-add VJP over 125*C-float
rows — also ~30x fewer scatter descriptors than per-cell.

Addressing parity with the reference (gridencoder.cu:53-71): levels whose
cell count fits the table keep a dense block layout; larger levels hash the
*block* coordinate with the same xor-prime hash, modulo the level's row
count.  Halo cells are independent parameters (untied): the per-level
parameter count is ~2x the reference's at equal hashmap size, and the
interpolated field may be discontinuous at block boundaries (collision-like
noise the MLP absorbs, validated by the end-to-end convergence tests).
`enerf_tpu/ops/hashgrid.py` remains the exact-parity per-cell path.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

_PRIMES = (1, 2654435761, 805459861)
# default block geometry (meta.block overrides): 4^3 cells/row + halo
BLOCK = 4
HALO = 5
ROW_CELLS = HALO ** 3  # 125


class BlockGridMeta:
    """Static per-level constants for the block-packed grid (3D only).

    Hashes by configuration value so identical metas share jit caches.
    """

    def _key(self):
        return (
            self.num_levels, self.level_dim, self.per_level_scale,
            self.base_resolution, self.log2_hashmap_size, self.block,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return type(other) is type(self) and self._key() == other._key()

    def __init__(
        self,
        num_levels=16,
        level_dim=2,
        per_level_scale=2.0,
        base_resolution=16,
        log2_hashmap_size=19,
        desired_resolution=None,
        block=BLOCK,
    ):
        # block geometry: block^3 cells per row + one-cell halo.  block=4
        # (125-cell rows, 1 KB f32) maximizes cells/gather; block=3
        # (64-cell rows, 512 B — the widest 'free' gather width AND half
        # the backward scatter bytes) trades param locality for bandwidth.
        self.block = int(block)
        self.halo = self.block + 1
        self.row_cells = self.halo ** 3
        if desired_resolution is not None and num_levels > 1:
            per_level_scale = float(
                np.exp2(np.log2(desired_resolution / base_resolution) / (num_levels - 1))
            )
        self.input_dim = 3
        self.num_levels = int(num_levels)
        self.level_dim = int(level_dim)
        self.per_level_scale = float(per_level_scale)
        self.base_resolution = int(base_resolution)
        self.log2_hashmap_size = int(log2_hashmap_size)
        self.output_dim = self.num_levels * self.level_dim

        S = np.log2(self.per_level_scale)
        H = self.base_resolution
        BLK = self.block
        # cap rows so hashed levels hold ~2x the reference's entry budget
        # independent of block size (block=4: 8192 rows x 125 cells)
        max_rows = max((2 ** self.log2_hashmap_size * 128) // (64 * self.row_cells), 1)

        scales, resolutions, nbs, n_rows, hashed, offsets = [], [], [], [], [], [0]
        for lvl in range(self.num_levels):
            scale = np.exp2(lvl * S) * H - 1.0
            res = int(np.ceil(scale)) + 1
            nb = (res + 1 + BLK - 1) // BLK  # blocks per dim (corners <= res)
            dense_rows = nb ** 3
            is_hashed = dense_rows > max_rows
            rows = max_rows if is_hashed else dense_rows
            scales.append(scale)
            resolutions.append(res)
            nbs.append(nb)
            n_rows.append(rows)
            hashed.append(is_hashed)
            offsets.append(offsets[-1] + rows)
        self.scales = np.asarray(scales, np.float32)
        self.resolutions = np.asarray(resolutions, np.int64)
        self.nbs = np.asarray(nbs, np.int64)
        self.n_rows = np.asarray(n_rows, np.int64)
        self.hashed = np.asarray(hashed, bool)
        self.offsets = np.asarray(offsets, np.int64)
        self.total_rows = int(self.offsets[-1])

        self._scales_dev = jnp.asarray(self.scales)
        self._nbs_dev = jnp.asarray(self.nbs.astype(np.int32))
        self._rows_dev = jnp.asarray(self.n_rows.astype(np.uint32))
        self._offsets_dev = jnp.asarray(self.offsets[:-1].astype(np.int32))
        self._hashed_dev = jnp.asarray(self.hashed)


def init_block_table(key, meta, dtype=jnp.float32):
    """[total_rows, row_cells * C] parameters, U(-1e-4, 1e-4) like the reference."""
    return jax.random.uniform(
        key,
        (meta.total_rows, meta.row_cells * meta.level_dim),
        dtype=dtype,
        minval=-1e-4,
        maxval=1e-4,
    )


def block_address(x, meta):
    """Block addressing for pre-clipped [n, 3] positions in [0, 1].

    Returns (rid_local [n, L] int32 row id within each level's table,
    lo [n, L, 3] int32 cell offset in the block, frac [n, L, 3] f32).
    Shared by the forward encode and the fast Pallas backward.
    """
    pos = x[:, None, :] * meta._scales_dev[None, :, None] + 0.5  # [n, L, 3]
    pg = jnp.floor(pos)
    frac = pos - pg
    pg = pg.astype(jnp.int32)
    b = pg // meta.block                 # block coords [n, L, 3]
    lo = pg - b * meta.block             # [n, L, 3] in [0, block-1]

    # row index: dense linear or xor-prime block hash (gridencoder.cu:34-50)
    nb = meta._nbs_dev[None, :]          # [1, L]
    dense = (b[..., 0] * nb + b[..., 1]) * nb + b[..., 2]
    bu = b.astype(jnp.uint32)
    h = bu[..., 0] * jnp.uint32(_PRIMES[0])
    h = h ^ (bu[..., 1] * jnp.uint32(_PRIMES[1]))
    h = h ^ (bu[..., 2] * jnp.uint32(_PRIMES[2]))
    rid = jnp.where(meta._hashed_dev[None, :], h, dense.astype(jnp.uint32))
    rid = (rid % meta._rows_dev[None, :]).astype(jnp.int32)
    return rid, lo, frac


def _trilinear_weights(lo, frac, meta):
    """Per-cell trilinear weights on a flat [row_cells] iota.

    lo: [..., 3] int32 cell offsets, frac: [..., 3] f32 -> W [..., RC] f32
    with W[p] = wx(px) * wy(py) * wz(pz).
    """
    HA, RC = meta.halo, meta.row_cells
    p = np.arange(RC)
    pxs = jnp.asarray(p // (HA * HA), jnp.int32)
    pys = jnp.asarray((p // HA) % HA, jnp.int32)
    pzs = jnp.asarray(p % HA, jnp.int32)

    def axis_w(pidx, d):
        l = lo[..., d][..., None]
        f = frac[..., d][..., None]
        return (jnp.where(pidx == l, 1.0 - f, 0.0)
                + jnp.where(pidx == l + 1, f, 0.0))

    return axis_w(pxs, 0) * axis_w(pys, 1) * axis_w(pzs, 2)


def _encode_chunk(x, table, meta):
    """[n, 3] in [0, 1] (pre-clipped) -> [n, L, C].

    Row layout is channel-planar: row[c * 125 + p] with p = (px*5+py)*5+pz,
    so each channel's contraction runs over a contiguous 125-wide lane axis
    (interleaved [125, C] layouts leave the VPU lanes ~60x underfilled).
    The trilinear weight vector is built directly on a [125] iota —
    elementwise, fusable, never materialized separately.
    """
    n = x.shape[0]
    L, C = meta.num_levels, meta.level_dim

    rid_local, lo, frac = block_address(x, meta)
    rid = rid_local + meta._offsets_dev[None, :]

    RC = meta.row_cells
    W = _trilinear_weights(lo, frac, meta)                # [n, L, 125]

    rows = table[rid]                                     # [n, L, C*125] gather
    W = W.astype(rows.dtype)
    feats = [
        jnp.sum(W * rows[..., c * RC : (c + 1) * RC], axis=-1)
        for c in range(C)
    ]
    return jnp.stack(feats, axis=-1)                      # [n, L, C]


@functools.partial(jax.jit, static_argnames=("meta", "point_chunk"))
def block_encode(x01, table, meta, point_chunk=1 << 16):
    """Encode [N, 3] positions in [0, 1] -> [N, L*C].

    point_chunk bounds the materialized gather: rows for a chunk are
    [point_chunk, L, 125*C] (~500 MB f32 at the defaults), processed by a
    lax.map.  The table path is linear, so backward residuals are only the
    row ids and weights — the rows themselves are never saved.
    """
    N = x01.shape[0]
    L, C = meta.num_levels, meta.level_dim

    x = x01.astype(jnp.float32)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)  # [N]
    x = jnp.clip(x, 0.0, 1.0)

    if N <= point_chunk:
        out = _encode_chunk(x, table, meta)
    else:
        n_chunks = -(-N // point_chunk)
        pad = n_chunks * point_chunk - N
        xp = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)], 0)
        # Rematerialize the chunk body: scan AD otherwise STACKS each
        # chunk's trilinear-weight tensor W ([chunk, L, 125] f32) as a
        # saved residual — [n_chunks, 65536, L, 125] is 7.8 GB at the
        # fixed-step renderer's 1M-point load (measured OOM on v5e).
        # W is pure VPU math from xc (no gathers), and the table-VJP is
        # the transpose of the linear gather, so the recompute costs no
        # HBM traffic.  The single-chunk hot path (march, compacted to
        # <= point_chunk) is untouched.
        out = jax.lax.map(
            jax.checkpoint(lambda xc: _encode_chunk(xc, table, meta)),
            xp.reshape(n_chunks, point_chunk, 3),
        ).reshape(n_chunks * point_chunk, L, C)[:N]

    out = jnp.where(oob[:, None, None], 0.0, out)
    return out.reshape(N, L * C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def block_encode_bf16(x01, table, meta):
    """block_encode with the GATHER running on a bf16 copy of the table.

    Why: blk4 f32 rows are 1 KB — past the ~512 B width where TPU gathers
    stop being free (BENCH_NOTES: >=512 B rows run ~60 GB/s byte-bound,
    <=512 B run ~100 M rows/s address-bound).  bf16 halves the row to
    500 B, putting the forward back on the address-rate ceiling.  The
    one-off table cast (8 MB) is amortized over ~2 M row gathers per step.

    Precision: forward activations carry bf16 table values (0.4% relative
    — the MLP consuming them already computes in bf16; the reference
    stores its whole table in fp16 under --fp16, grid.py:133-135).
    Parameters, the backward scatter-add, and Adam all stay f32: the
    encode is linear in the table, so its table-VJP (scatter of the
    trilinear weights x output grads) never reads table values and is
    evaluated here in full f32.

    Position gradients are zero (rays are data, not parameters — same
    contract as ops/scatter_accum.block_encode_fast).
    """
    return block_encode(x01, table.astype(jnp.bfloat16), meta)


def _beb_fwd(x01, table, meta):
    return block_encode_bf16(x01, table, meta), x01


def _beb_bwd(meta, x01, g, point_chunk=1 << 16):
    """Direct f32 scatter-add of W (x) g — the same math XLA derives for
    block_encode's table-VJP, minus the forward re-trace; chunked to bound
    the [chunk, L, C*RC] row materialization."""
    N = x01.shape[0]
    L, C, RC = meta.num_levels, meta.level_dim, meta.row_cells

    x = jnp.clip(x01.astype(jnp.float32), 0.0, 1.0)
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)
    g = jnp.where(oob[:, None, None], 0.0,
                  g.reshape(N, L, C).astype(jnp.float32))

    def chunk_grad(gtab, xc, gc):
        rid, lo, frac = block_address(xc, meta)
        flat = rid + meta._offsets_dev[None, :]
        W = _trilinear_weights(lo, frac, meta)            # [n, L, RC]
        rows = jnp.concatenate(
            [gc[..., c : c + 1] * W for c in range(C)], axis=-1)
        return gtab.at[flat.reshape(-1)].add(
            rows.reshape(-1, C * RC), mode="drop")

    gtab = jnp.zeros((meta.total_rows, RC * C), jnp.float32)
    if N <= point_chunk:
        gtab = chunk_grad(gtab, x, g)
    else:
        n_chunks = -(-N // point_chunk)
        pad = n_chunks * point_chunk - N
        xp = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)], 0)
        gp = jnp.concatenate([g, jnp.zeros((pad, L, C), g.dtype)], 0)
        gtab, _ = jax.lax.scan(
            lambda t, args: (chunk_grad(t, *args), None),
            gtab,
            (xp.reshape(n_chunks, point_chunk, 3),
             gp.reshape(n_chunks, point_chunk, L, C)),
        )
    return jnp.zeros_like(x01), gtab


block_encode_bf16.defvjp(_beb_fwd, _beb_bwd)


# ---------------------------------------------------------------------------
# Sorted segment-sum backward (round-3 attack on the scatter cost center,
# BENCH_NOTES round-2 stage breakdown: ~29 ms of the 62 ms step).


def _axis_weights(lo, frac, meta, deriv_axis=None):
    """Per-cell trilinear weights (or their d/dfrac along one axis) on the
    flat [row_cells] iota.  lo/frac: [..., 3] -> [..., RC]."""
    HA, RC = meta.halo, meta.row_cells
    p = np.arange(RC)
    pidxs = [jnp.asarray(p // (HA * HA), jnp.int32),
             jnp.asarray((p // HA) % HA, jnp.int32),
             jnp.asarray(p % HA, jnp.int32)]
    out = 1.0
    for d in range(3):
        l = lo[..., d][..., None]
        f = frac[..., d][..., None]
        if d == deriv_axis:
            w = (jnp.where(pidxs[d] == l, -1.0, 0.0)
                 + jnp.where(pidxs[d] == l + 1, 1.0, 0.0))
        else:
            w = (jnp.where(pidxs[d] == l, 1.0 - f, 0.0)
                 + jnp.where(pidxs[d] == l + 1, f, 0.0))
        out = out * w
    return out


def _segsum_chunk_table_grad(xc, gc, meta):
    """Table gradient of one encode chunk via sort + prefix-sum segment
    reduction + a SORTED-UNIQUE scatter, instead of XLA's duplicate-index
    scatter-add (measured ~64 GB/s ceiling, BENCH_NOTES.md:91).

    xc: [n, 3] clipped positions; gc: [n, L, C] (oob rows pre-zeroed).
    Returns [total_rows + 1, C*RC] (last row = pad bucket, caller trims).

    The sort moves only 40 B/sample of compact payload (lo, frac, ct);
    the 1 KB row gradients are materialized ONCE in sorted order, reduced
    by run boundaries with a cumsum, and written with
    indices_are_sorted=True — every HBM touch is a streaming pass.
    """
    n = xc.shape[0]
    L, C, RC = meta.num_levels, meta.level_dim, meta.row_cells
    M = n * L

    rid, lo, frac = block_address(xc, meta)
    keys = (rid + meta._offsets_dev[None, :]).reshape(M)

    order = jnp.argsort(keys)
    sid = keys[order]
    lo_s = lo.reshape(M, 3)[order]
    frac_s = frac.reshape(M, 3)[order]
    ct_s = gc.reshape(M, C)[order]

    W = _axis_weights(lo_s, frac_s, meta)                   # [M, RC]
    G = jnp.concatenate(
        [ct_s[:, c : c + 1] * W for c in range(C)], axis=-1)  # [M, C*RC]
    csum = jnp.cumsum(G, axis=0)

    is_last = jnp.concatenate([sid[1:] != sid[:-1],
                               jnp.ones((1,), bool)])
    # unique rows per chunk <= total_rows: exact static bound for nonzero
    U = min(meta.total_rows, M)
    last_idx = jnp.nonzero(is_last, size=U, fill_value=M - 1)[0]
    sums = csum[last_idx]                                    # [U, C*RC]
    sums = jnp.concatenate([sums[:1], sums[1:] - sums[:-1]], axis=0)
    count = jnp.sum(is_last)
    valid = jnp.arange(U) < count
    # pads -> the extra bucket row (stays sorted: total_rows >= any id)
    rows = jnp.where(valid, sid[last_idx], meta.total_rows)
    sums = jnp.where(valid[:, None], sums, 0.0)
    return jnp.zeros((meta.total_rows + 1, C * RC), jnp.float32).at[rows].add(
        sums, indices_are_sorted=True, unique_indices=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def block_encode_segsum(x01, table, meta, compute_dx=False):
    """block_encode with the table backward re-expressed as
    sort -> prefix-sum segment reduce -> sorted-unique scatter
    (_segsum_chunk_table_grad) instead of XLA's duplicate-index
    scatter-add.  Forward is identical to block_encode.

    compute_dx (static): position gradients cost one extra row gather in
    the backward; they are OFF by default (rays are data in training) and
    the VJP then returns ZERO dx — select compute_dx=True for
    pose-refinement-style workloads (reference dy_dx path,
    gridencoder.cu:176-221).
    """
    return block_encode(x01, table, meta)


def _bes_fwd(x01, table, meta, compute_dx):
    return block_encode(x01, table, meta), (x01, table if compute_dx else None)


def _bes_bwd(meta, compute_dx, res, g, point_chunk=1 << 16):
    x01, table = res
    N = x01.shape[0]
    L, C, RC = meta.num_levels, meta.level_dim, meta.row_cells

    x = jnp.clip(x01.astype(jnp.float32), 0.0, 1.0)
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)
    g = jnp.where(oob[:, None, None], 0.0,
                  g.reshape(N, L, C).astype(jnp.float32))

    def chunk_dx_scaled(xc, gc):
        # dx_d = sum_{l,c} ct[l,c] * scale_l * <dW/dfrac_d, row_{l,c}>
        # (frac = x01*scale + 0.5 - floor => dfrac/dx01 = scale per level)
        rid, lo, frac = block_address(xc, meta)
        flat = rid + meta._offsets_dev[None, :]
        rows = table[flat]                                    # [n, L, C*RC]
        dxs = []
        for d in range(3):
            dW = _axis_weights(lo, frac, meta, deriv_axis=d)  # [n, L, RC]
            per_level = 0.0
            for c in range(C):
                per_level = per_level + gc[..., c] * jnp.sum(
                    dW * rows[..., c * RC:(c + 1) * RC], axis=-1)  # [n, L]
            dxs.append(jnp.sum(per_level * meta._scales_dev[None, :], axis=-1))
        return jnp.stack(dxs, axis=-1)

    if N <= point_chunk:
        gtab = _segsum_chunk_table_grad(x, g, meta)[:-1]
        dx = chunk_dx_scaled(x, g) if compute_dx else jnp.zeros_like(x01)
    else:
        n_chunks = -(-N // point_chunk)
        pad = n_chunks * point_chunk - N
        xp = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)], 0)
        gp = jnp.concatenate([g, jnp.zeros((pad, L, C), g.dtype)], 0)
        xr = xp.reshape(n_chunks, point_chunk, 3)
        gr = gp.reshape(n_chunks, point_chunk, L, C)
        gtab = jax.lax.scan(
            lambda t, args: (t + _segsum_chunk_table_grad(*args, meta), None),
            jnp.zeros((meta.total_rows + 1, C * RC), jnp.float32),
            (xr, gr),
        )[0][:-1]
        if compute_dx:
            dx = jax.lax.map(
                lambda args: chunk_dx_scaled(*args), (xr, gr)
            ).reshape(-1, 3)[:N]
        else:
            dx = jnp.zeros_like(x01)
    # oob positions produced zero output -> zero dx
    if compute_dx:
        dx = jnp.where(oob[:, None], 0.0, dx).astype(x01.dtype)
    return dx, gtab


block_encode_segsum.defvjp(_bes_fwd, _bes_bwd)


# ---------------------------------------------------------------------------
# MXU-routed encode (round-4 attack on the two measured cost centers at the
# reference shape: address-bound forward gathers and the ~64 GB/s backward
# scatter-add).  Two exact, quality-neutral re-routings:
#
# 1. COARSE levels (n_rows <= mxu_max_rows): the gather/scatter pair is
#    replaced by one-hot MATMULS on the MXU.  rows = onehot(rid) @ table_l
#    forward, gtab_l = onehot(rid)^T @ grad_rows backward — exact (the
#    one-hot has a single 1.0 per row; f32 accumulation), and the flop
#    cost n*R*row_width is tiny for small R.  This removes those levels'
#    per-row address generation (forward) and duplicate-heavy RMW
#    (backward: a 125-row level absorbs ~1000 updates/row from a 131k
#    stream).  Contention pattern being replaced: gridencoder.cu:225-311.
#
# 2. FINE levels keep the gather forward, but the backward update stream
#    is RUN-MERGED before the scatter: per-ray compaction preserves
#    t-order (render/march.py), so consecutive samples land in the SAME
#    block row for every level whose block span exceeds dt — the stream
#    has long runs of equal row ids.  `coalesce_rounds` pairwise-merge
#    rounds (all elementwise, one diminishing pass each) sum adjacent
#    equal-id rows and retire the duplicates to a sentinel row that the
#    scatter drops, cutting the read-modify-write traffic by up to
#    2^rounds while reading the update stream exactly once more.
#
# Position gradients are zero (rays are data in training — same contract
# as block_encode_bf16); use block_encode_segsum(compute_dx=True) for the
# reference's dy_dx role.


def _mxu_split(meta, mxu_max_rows):
    """Static level split: ([coarse level ids], [fine level ids])."""
    coarse = [l for l in range(meta.num_levels)
              if int(meta.n_rows[l]) <= int(mxu_max_rows)]
    fine = [l for l in range(meta.num_levels) if l not in coarse]
    return coarse, fine


def _encode_chunk_mxu(x, table, meta, mxu_max_rows):
    """Forward of block_encode with coarse-level rows from one-hot matmuls.

    Exact-equal to _encode_chunk: the one-hot row has a single 1.0, so the
    f32 dot reproduces the gathered row bit-for-bit.
    """
    L, C, RC = meta.num_levels, meta.level_dim, meta.row_cells
    coarse, fine = _mxu_split(meta, mxu_max_rows)

    rid_local, lo, frac = block_address(x, meta)
    W = _trilinear_weights(lo, frac, meta)                 # [n, L, RC]

    rows_parts = [None] * L
    if fine:
        fid = jnp.asarray(fine, jnp.int32)
        rid_f = rid_local[:, fid] + meta._offsets_dev[fid][None, :]
        rows_f = table[rid_f]                              # [n, Lf, RC*C]
        for i, l in enumerate(fine):
            rows_parts[l] = rows_f[:, i]
    for l in coarse:
        R = int(meta.n_rows[l])
        off = int(meta.offsets[l])
        tab_l = jax.lax.dynamic_slice_in_dim(table, off, R, axis=0)
        onehot = (rid_local[:, l, None]
                  == jnp.arange(R, dtype=jnp.int32)[None, :])
        rows_parts[l] = jnp.dot(onehot.astype(table.dtype), tab_l,
                                preferred_element_type=jnp.float32)

    rows = jnp.stack(rows_parts, axis=1)                   # [n, L, RC*C]
    Wd = W.astype(rows.dtype)
    feats = [
        jnp.sum(Wd * rows[..., c * RC:(c + 1) * RC], axis=-1)
        for c in range(C)
    ]
    return jnp.stack(feats, axis=-1)                       # [n, L, C]


def _run_merge(rows, keys, sentinel, rounds):
    """Pairwise run-merge: `rounds` passes, each summing adjacent rows with
    equal keys and retiring the absorbed row to `sentinel`.

    rows: [M, D]; keys: [M] int32 (scatter-ready flat ids, sentinel for
    padding).  Returns (rows, keys) of the SAME shape — merged rows carry
    the run sums, absorbed rows are zeroed with key=sentinel (the caller's
    scatter drops them).  Pass k merges at stride 2^k, so a run of length
    2^rounds collapses to one live row.
    """
    M, D = rows.shape
    for r in range(rounds):
        s = 1 << r
        pairs = M // (2 * s)
        rk = keys.reshape(pairs, 2, s)
        rv = rows.reshape(pairs, 2, s, D)
        # merge slot 1 into slot 0 where the (stride-aligned) keys match
        # and both are live; runs are contiguous so equal keys at the
        # aligned position imply one run spanning the pair.
        same = (rk[:, 0] == rk[:, 1]) & (rk[:, 0] != sentinel)
        rows0 = rv[:, 0] + jnp.where(same[..., None], rv[:, 1], 0.0)
        rows1 = jnp.where(same[..., None], 0.0, rv[:, 1])
        keys1 = jnp.where(same, sentinel, rk[:, 1])
        rows = jnp.stack([rows0, rows1], axis=1).reshape(M, D)
        keys = jnp.stack([rk[:, 0], keys1], axis=1).reshape(M)
    return rows, keys


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def block_encode_mxu(x01, table, meta, mxu_max_rows=2048, coalesce_rounds=3):
    """block_encode with MXU-routed coarse levels and a run-merged fine
    scatter backward (see module-level round-4 note).  Forward output is
    the same math as block_encode (one-hot f32 matmul == gather), equal up
    to f32 reduction-order noise from different XLA fusions; the table
    gradient is likewise the same sum in a different association order."""
    N = x01.shape[0]
    L, C = meta.num_levels, meta.level_dim
    x = x01.astype(jnp.float32)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)
    x = jnp.clip(x, 0.0, 1.0)
    out = _encode_chunk_mxu(x, table, meta, mxu_max_rows)
    out = jnp.where(oob[:, None, None], 0.0, out)
    return out.reshape(N, L * C)


def _bem_fwd(x01, table, meta, mxu_max_rows, coalesce_rounds):
    return block_encode_mxu(x01, table, meta, mxu_max_rows,
                            coalesce_rounds), x01


def _bem_bwd(meta, mxu_max_rows, coalesce_rounds, x01, g):
    N = x01.shape[0]
    L, C, RC = meta.num_levels, meta.level_dim, meta.row_cells
    D = RC * C
    coarse, fine = _mxu_split(meta, mxu_max_rows)

    x = jnp.clip(x01.astype(jnp.float32), 0.0, 1.0)
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)
    g = jnp.where(oob[:, None, None], 0.0,
                  g.reshape(N, L, C).astype(jnp.float32))

    rid_local, lo, frac = block_address(x, meta)
    W = _trilinear_weights(lo, frac, meta)                 # [n, L, RC]

    def grad_rows(levels):
        ids = jnp.asarray(levels, jnp.int32)
        Wl = W[:, ids]                                     # [n, k, RC]
        gl = g[:, ids]                                     # [n, k, C]
        return jnp.concatenate(
            [gl[..., c:c + 1] * Wl for c in range(C)], axis=-1)  # [n,k,D]

    gtab = jnp.zeros((meta.total_rows + 1, D), jnp.float32)
    if fine:
        fid = jnp.asarray(fine, jnp.int32)
        keys = rid_local[:, fid] + meta._offsets_dev[fid][None, :]
        rows = grad_rows(fine)                             # [n, Lf, D]
        # level-major layout keeps each level's along-ray runs contiguous
        rows = jnp.swapaxes(rows, 0, 1).reshape(-1, D)
        keys = jnp.swapaxes(keys, 0, 1).reshape(-1)
        sentinel = jnp.int32(meta.total_rows)
        if coalesce_rounds > 0:
            M = rows.shape[0]
            pad = (-M) % (1 << coalesce_rounds)
            if pad:
                rows = jnp.concatenate(
                    [rows, jnp.zeros((pad, D), rows.dtype)], 0)
                keys = jnp.concatenate(
                    [keys, jnp.full((pad,), sentinel)], 0)
            rows, keys = _run_merge(rows, keys, sentinel, coalesce_rounds)
        gtab = gtab.at[keys].add(rows, mode="drop")
    gtab = gtab[:-1]

    for l in coarse:
        R = int(meta.n_rows[l])
        off = int(meta.offsets[l])
        onehot = (rid_local[:, l, None]
                  == jnp.arange(R, dtype=jnp.int32)[None, :])
        G_l = grad_rows([l])[:, 0]                         # [n, D]
        gtab_l = jnp.dot(onehot.astype(jnp.float32).T, G_l,
                         preferred_element_type=jnp.float32)
        gtab = jax.lax.dynamic_update_slice_in_dim(
            gtab, gtab_l + jax.lax.dynamic_slice_in_dim(gtab, off, R, 0),
            off, axis=0)

    return jnp.zeros_like(x01), gtab


block_encode_mxu.defvjp(_bem_fwd, _bem_bwd)
