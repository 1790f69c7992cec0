"""Multiresolution hash-grid encoding (instant-ngp section 3), TPU-native.

Parity targets (semantics, not implementation):
  - reference gridencoder/src/gridencoder.cu:34-71 — per-level addressing:
    dense linear index while the level fits in its table, else spatial hash
    x*1 ^ y*2654435761 ^ z*805459861, both taken modulo the level's table
    size; 'tiled' gridtype keeps the (partial) dense index.
  - reference gridencoder/src/gridencoder.cu:74-222 — forward: per level,
    pos = x01*scale + 0.5 with scale = 2^(level*S)*H - 1; trilinear blend of
    the 2^D corner embeddings; inputs outside [0,1] produce zeros.
  - reference gridencoder/grid.py:113-135 — level table layout (size
    min(2^log2_hashmap_size, (res+1)^D) rounded up to a multiple of 8,
    flat concatenated table) and U(-1e-4, 1e-4) init.

TPU design: all levels are evaluated at once as one batched gather from the
flat [total_entries, C] table (gathers tile well on TPU; there is no shared
memory to stage per-level tables into, and XLA pipelines HBM reads).  The
backward pass is the gather's autodiff VJP — a deterministic scatter-add —
replacing the CUDA atomicAdd contention loop (gridencoder.cu:294-309);
gradients w.r.t. the *inputs* (the dy_dx path, gridencoder.cu:176-221) fall
out of autodiff for free and are dead-code-eliminated when unused.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

# Hash primes, reference gridencoder.cu:41 (standard instant-ngp constants).
_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


class HashGridMeta:
    """Static (host-side) per-level constants for a hash grid.

    Mirrors the layout computed by the reference GridEncoder.__init__
    (gridencoder/grid.py:113-126) so parameter tables are interchangeable.
    Hashes by configuration value so separately-constructed but identical
    metas share jit caches.
    """

    def _key(self):
        return (
            self.input_dim, self.num_levels, self.level_dim,
            self.per_level_scale, self.base_resolution,
            self.log2_hashmap_size, self.gridtype,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return type(other) is type(self) and self._key() == other._key()

    def __init__(
        self,
        input_dim=3,
        num_levels=16,
        level_dim=2,
        per_level_scale=2.0,
        base_resolution=16,
        log2_hashmap_size=19,
        desired_resolution=None,
        gridtype="hash",
    ):
        if desired_resolution is not None and num_levels > 1:
            per_level_scale = float(
                np.exp2(np.log2(desired_resolution / base_resolution) / (num_levels - 1))
            )
        self.input_dim = int(input_dim)
        self.num_levels = int(num_levels)
        self.level_dim = int(level_dim)
        self.per_level_scale = float(per_level_scale)
        self.base_resolution = int(base_resolution)
        self.log2_hashmap_size = int(log2_hashmap_size)
        self.gridtype = gridtype
        self.output_dim = self.num_levels * self.level_dim

        D, L = self.input_dim, self.num_levels
        S = np.log2(self.per_level_scale)
        H = self.base_resolution
        max_params = 2 ** self.log2_hashmap_size

        scales, resolutions, sizes, offsets = [], [], [], [0]
        for lvl in range(L):
            # reference gridencoder.cu:124-125: scale/resolution per level
            scale = np.exp2(lvl * S) * H - 1.0
            res = int(np.ceil(scale)) + 1
            scales.append(scale)
            resolutions.append(res)
            # reference grid.py:117-119: table size per level
            n = min(max_params, (res + 1) ** D)
            n = int(np.ceil(n / 8) * 8)
            sizes.append(n)
            offsets.append(offsets[-1] + n)
        self.scales = np.asarray(scales, np.float32)  # [L]
        self.resolutions = np.asarray(resolutions, np.int64)  # [L]
        self.sizes = np.asarray(sizes, np.int64)  # [L]
        self.offsets = np.asarray(offsets, np.int64)  # [L+1]
        self.total_entries = int(self.offsets[-1])

        # Dense-index dimension mask: reference gridencoder.cu:58-62 only
        # accumulates pos[d]*stride while stride <= hashmap_size (stride is
        # checked before the add, then multiplied by res+1).
        strides = np.ones((L, D), np.int64)
        use_dim = np.zeros((L, D), bool)
        for lvl in range(L):
            stride = 1
            for d in range(D):
                if stride <= sizes[lvl]:
                    strides[lvl, d] = stride
                    use_dim[lvl, d] = True
                    stride *= resolutions[lvl] + 1
        # reference gridencoder.cu:66: hash iff gridtype==hash and the final
        # stride (res+1)^{dims processed} overflows the table.
        final_stride = np.where(
            use_dim.all(axis=1),
            (self.resolutions + 1) ** D,
            2 ** 62,  # loop exited early => stride already > size
        ).astype(np.int64)
        self.is_hashed = (gridtype == "hash") & (final_stride > self.sizes)
        self.dense_strides = strides  # [L, D], int64 (masked entries = 1)
        self.use_dim = use_dim  # [L, D]

        # Device-resident constant copies (uint32 modular arithmetic).
        self._scales_dev = jnp.asarray(self.scales)
        self._strides_dev = jnp.asarray(
            (self.dense_strides % (2 ** 32)).astype(np.uint32) * self.use_dim.astype(np.uint32)
        )
        self._sizes_dev = jnp.asarray(self.sizes.astype(np.uint32))
        self._offsets_dev = jnp.asarray(self.offsets[:-1].astype(np.int64).astype(np.int32))
        self._is_hashed_dev = jnp.asarray(self.is_hashed)


def init_hash_table(key, meta, dtype=jnp.float32):
    """U(-1e-4, 1e-4) init, reference grid.py:133-135."""
    return jax.random.uniform(
        key, (meta.total_entries, meta.level_dim), dtype=dtype, minval=-1e-4, maxval=1e-4
    )


def _corner_bits(input_dim):
    return np.array(
        [[(c >> d) & 1 for d in range(input_dim)] for c in range(2 ** input_dim)],
        np.uint32,
    )  # [2^D, D]


@functools.partial(jax.jit, static_argnames=("meta",))
def hash_encode(x01, table, meta):
    """Encode positions with a multiresolution hash grid.

    Args:
      x01: [N, D] positions normalized to [0, 1] (the caller maps from
           [-bound, bound]; reference grid.py:144).
      table: [total_entries, C] flat embedding table (all levels).
      meta: HashGridMeta (static).

    Returns:
      [N, L*C] encoding, channel order level-major then channel
      (matches reference grid.py:52 permute to [B, L*C]).
    """
    N = x01.shape[0]
    D, L, C = meta.input_dim, meta.num_levels, meta.level_dim

    x = x01.astype(jnp.float32)
    # reference gridencoder.cu:96-121: out-of-[0,1] inputs produce zeros.
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)  # [N]
    x = jnp.clip(x, 0.0, 1.0)

    # [N, L, D] continuous grid coords (reference gridencoder.cu:131-136)
    pos = x[:, None, :] * meta._scales_dev[None, :, None] + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    pos_grid = pos_grid.astype(jnp.uint32)

    bits = _corner_bits(D)  # [2^D, D] numpy
    strides = meta._strides_dev[None, :, :]  # [1, L, D] uint32
    sizes = meta._sizes_dev[None, :]  # [1, L] uint32
    offsets = meta._offsets_dev[None, :]  # [1, L] int32
    is_hashed = meta._is_hashed_dev[None, :]  # [1, L]

    out = jnp.zeros((N, L, C), dtype=table.dtype)
    for c in range(2 ** D):
        cb = bits[c]  # static [D]
        corner = pos_grid + jnp.asarray(cb, jnp.uint32)[None, None, :]  # [N, L, D]
        # trilinear weight: prod over dims of frac or (1-frac)
        w = jnp.prod(jnp.where(cb[None, None, :] == 1, frac, 1.0 - frac), axis=-1)  # [N, L]
        # dense linear index (uint32 wrap matches CUDA semantics)
        dense = jnp.sum(corner * strides, axis=-1, dtype=jnp.uint32)  # [N, L]
        # spatial hash (reference fast_hash, gridencoder.cu:34-50)
        h = jnp.zeros_like(dense)
        for d in range(D):
            h = h ^ (corner[..., d] * jnp.uint32(_PRIMES[d]))
        idx = jnp.where(is_hashed, h, dense) % sizes  # [N, L] uint32
        flat = idx.astype(jnp.int32) + offsets  # [N, L] int32
        vals = table[flat]  # [N, L, C] gather
        out = out + w[..., None].astype(table.dtype) * vals

    out = jnp.where(oob[:, None, None], 0.0, out)
    return out.reshape(N, L * C)
