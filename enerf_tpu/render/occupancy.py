"""Multi-cascade occupancy grid: state, maintenance, frustum culling.

Parity: reference nerf/renderer.py:86-126 (state: 128^3 x cascade density
grid + bitfield, mean_density, iter_density), :473-563 (update_extra_state:
full update for the first 16 iterations then half-random/half-occupied
resampling; EMA decay max(grid*0.95, new); sigma scale
density_scale * 0.003383 = 2*sqrt(3)/1024; threshold min(mean_density,
density_thresh)), :408-471 (mark_untrained_grid camera-frustum culling).

TPU design: the grid is an explicit pytree (OccupancyState) threaded through
jitted update functions — no registered buffers.  Cells are indexed linearly
(x*H^2 + y*H + z); Morton order is unnecessary on TPU (no warp-locality to
exploit) and kept only in ops/morton.py for reference parity.  The
"resample occupied cells" step uses jax.random.categorical over the
occupancy mask — equivalent in distribution to the reference's
randint-over-nonzero-indices with replacement (renderer.py:524-526) and
static-shape friendly.
"""

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from enerf_tpu.models.field import field_density

GRID_SIZE = 128
DENSITY_SCALE_STEP = 0.003383  # 2*sqrt(3)/1024, renderer.py:513


class OccupancyState(NamedTuple):
    density_grid: jnp.ndarray   # [CAS, H^3] f32; -1 marks untrained cells
    occ_bitfield: jnp.ndarray   # [CAS, H^3] bool
    mean_density: jnp.ndarray   # scalar f32
    iter_density: jnp.ndarray   # scalar i32


def num_cascades(bound):
    return 1 + int(np.ceil(np.log2(max(bound, 1.0))))


def ball_bitfield(radius=0.48, cascades=1):
    """Synthetic trained-scene-like bitfield: a centered ball occupying
    ~6% of cascade 0 (benchmarks / dryruns — bench.py, __graft_entry__,
    scripts/perf_breakdown.py all share this shape)."""
    g = np.arange(GRID_SIZE)
    xs, ys, zs = np.meshgrid(g, g, g, indexing="ij")
    centers = 2.0 * np.stack([xs, ys, zs], -1) / (GRID_SIZE - 1) - 1.0
    ball = np.linalg.norm(centers, axis=-1) < radius
    bf = np.zeros((cascades, GRID_SIZE ** 3), bool)
    bf[0] = ball.reshape(-1)
    return jnp.asarray(bf)


def init_occupancy(bound):
    cas = num_cascades(bound)
    return OccupancyState(
        density_grid=jnp.zeros((cas, GRID_SIZE ** 3), jnp.float32),
        occ_bitfield=jnp.zeros((cas, GRID_SIZE ** 3), bool),
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
    )


def _cell_centers(coords, cas, bound):
    """coords: [N, 3] int cell coords -> world positions in the cascade."""
    H = GRID_SIZE
    xyz = 2.0 * coords.astype(jnp.float32) / (H - 1) - 1.0  # [-1, 1]
    cas_bound = jnp.minimum(2.0 ** cas, bound)
    half = cas_bound / H
    return xyz * (cas_bound - half), half


def _linear_coords(idx):
    """[N] linear cell index -> [N, 3] (x, y, z) coords."""
    H = GRID_SIZE
    x = idx // (H * H)
    y = (idx // H) % H
    z = idx % H
    return jnp.stack([x, y, z], axis=-1)


@functools.partial(jax.jit, static_argnames=("static", "density_scale", "density_thresh"))
def update_occupancy(params, static, occ, rng, density_scale=1.0,
                     density_thresh=0.01, decay=0.95):
    """One occupancy maintenance step (reference update_extra_state)."""
    H = GRID_SIZE
    cas = occ.density_grid.shape[0]
    bound = static.bound

    def query_sigma(coords, c, key):
        xyz, half = _cell_centers(coords, c, bound)
        noise = (jax.random.uniform(key, xyz.shape) * 2.0 - 1.0) * half
        sigma, _ = field_density(params, static, xyz + noise)
        return sigma * density_scale * DENSITY_SCALE_STEP

    tmp = jnp.full_like(occ.density_grid, -1.0)

    def full_update(tmp, rng):
        all_idx = jnp.arange(H ** 3, dtype=jnp.int32)
        coords = _linear_coords(all_idx)
        for c in range(cas):
            rng, k = jax.random.split(rng)
            # chunk the 2M-cell query to bound memory
            sig = jax.lax.map(
                lambda args: query_sigma(args[0], c, args[1]),
                (coords.reshape(64, -1, 3),
                 jax.random.split(k, 64)),
            ).reshape(-1)
            tmp = tmp.at[c].set(sig)
        return tmp

    def partial_update(tmp, rng):
        N = H ** 3 // 4
        for c in range(cas):
            rng, k1, k2, k3 = jax.random.split(rng, 4)
            rand_idx = jax.random.randint(k1, (N,), 0, H ** 3)
            # uniform-with-replacement over occupied cells via inverse CDF
            # (same distribution as the reference's randint over nonzero
            # indices, renderer.py:524-526; static-shape, no huge gumbel)
            mask = (occ.density_grid[c] > 0.0).astype(jnp.float32)
            cdf = jnp.cumsum(mask)
            total = jnp.maximum(cdf[-1], 1.0)
            u = jax.random.uniform(k2, (N,)) * total
            occ_idx = jnp.searchsorted(cdf, u, side="right").astype(jnp.int32)
            occ_idx = jnp.clip(occ_idx, 0, H ** 3 - 1)
            idx = jnp.concatenate([rand_idx, occ_idx])
            coords = _linear_coords(idx)
            sig = jax.lax.map(
                lambda args: query_sigma(args[0], c, args[1]),
                (coords.reshape(16, -1, 3), jax.random.split(k3, 16)),
            ).reshape(-1)
            tmp = tmp.at[c, idx].set(sig)
        return tmp

    rng, k = jax.random.split(rng)
    tmp = jax.lax.cond(
        occ.iter_density < 16,
        lambda: full_update(tmp, k),
        lambda: partial_update(tmp, k),
    )
    return _finish_update(occ, tmp, density_thresh, decay)


def _finish_update(occ, tmp, density_thresh, decay):
    """EMA decay + threshold + bitfield from the fresh queries `tmp`
    (reference renderer.py:528-563); cells with tmp < 0 are untouched."""
    valid = (occ.density_grid >= 0.0) & (tmp >= 0.0)
    new_grid = jnp.where(
        valid, jnp.maximum(occ.density_grid * decay, tmp), occ.density_grid
    )
    mean_density = jnp.mean(jnp.maximum(new_grid, 0.0))
    thresh = jnp.minimum(mean_density, density_thresh)
    bitfield = new_grid > thresh
    return OccupancyState(
        density_grid=new_grid,
        occ_bitfield=bitfield,
        mean_density=mean_density,
        iter_density=occ.iter_density + 1,
    )


def update_occupancy_sharded(params, static, occ, rng, *, axis_name,
                             n_lanes, density_scale=1.0, density_thresh=0.01,
                             decay=0.95):
    """Data-parallel occupancy maintenance for use INSIDE shard_map: each
    lane queries 1/n_lanes of the cells, results merge with one psum.

    The merge uses scatter-into-zeros + psum (value and count planes) so
    the output is provably replicated under shard_map's varying-mode
    checks (an all_gather would leave it lane-varying).

    The FULL phase splits the serial update's 64 query chunks across lanes
    with the serial per-chunk keys, so the sharded result is BITWISE equal
    to update_occupancy (tested on the 8-device mesh).  The resampling
    phase draws each lane's sample set from a lane-folded key; cells hit
    by several lanes average their queries — same distribution as the
    reference's sample-with-replacement resampling (renderer.py:524-526).
    """
    H = GRID_SIZE
    cas = occ.density_grid.shape[0]
    bound = static.bound
    lane = jax.lax.axis_index(axis_name)

    def query_sigma(coords, c, key):
        xyz, half = _cell_centers(coords, c, bound)
        noise = (jax.random.uniform(key, xyz.shape) * 2.0 - 1.0) * half
        sigma, _ = field_density(params, static, xyz + noise)
        return sigma * density_scale * DENSITY_SCALE_STEP

    # 64 chunks matches update_occupancy's full-update chunking, giving
    # BITWISE serial parity whenever n_lanes divides 64.  Larger meshes
    # (v5e-128+) use one chunk per lane instead — still a correct full
    # update, just a different (per-lane) noise stream than the serial one.
    N_CHUNKS = 64 if 64 % n_lanes == 0 else n_lanes
    assert H ** 3 % (4 * n_lanes) == 0 and H ** 3 % N_CHUNKS == 0, (
        f"mesh size {n_lanes} must divide {H}^3/4 cells"
    )
    per_lane = N_CHUNKS // n_lanes
    chunk_cells = H ** 3 // N_CHUNKS

    def full_queries(rng):
        """This lane's slice of the serial full update, serial keys."""
        idxs, sigs = [], []
        cell0 = lane * per_lane * chunk_cells
        idx = cell0 + jnp.arange(per_lane * chunk_cells, dtype=jnp.int32)
        coords = _linear_coords(idx)
        for c in range(cas):
            rng, k = jax.random.split(rng)
            keys = jax.lax.dynamic_slice_in_dim(
                jax.random.split(k, N_CHUNKS), lane * per_lane, per_lane)
            sig = jax.lax.map(
                lambda args: query_sigma(args[0], c, args[1]),
                (coords.reshape(per_lane, chunk_cells, 3), keys),
            ).reshape(-1)
            idxs.append(idx)
            sigs.append(sig)
        return jnp.stack(idxs), jnp.stack(sigs)

    def partial_queries(rng):
        rng = jax.random.fold_in(rng, lane)
        Nr = H ** 3 // 4 // n_lanes
        idxs, sigs = [], []
        for c in range(cas):
            rng, k1, k2, k3 = jax.random.split(rng, 4)
            rand_idx = jax.random.randint(k1, (Nr,), 0, H ** 3)
            mask = (occ.density_grid[c] > 0.0).astype(jnp.float32)
            cdf = jnp.cumsum(mask)
            total = jnp.maximum(cdf[-1], 1.0)
            u = jax.random.uniform(k2, (Nr,)) * total
            occ_idx = jnp.searchsorted(cdf, u, side="right").astype(jnp.int32)
            idx = jnp.concatenate(
                [rand_idx, jnp.clip(occ_idx, 0, H ** 3 - 1)])
            coords = _linear_coords(idx)
            nch = max(16 // n_lanes, 1)
            sig = jax.lax.map(
                lambda args: query_sigma(args[0], c, args[1]),
                (coords.reshape(nch, -1, 3), jax.random.split(k3, nch)),
            ).reshape(-1)
            idxs.append(idx)
            sigs.append(sig)
        return jnp.stack(idxs), jnp.stack(sigs)

    def merged(rng, full):
        idx, sig = full_queries(rng) if full else partial_queries(rng)
        val = jnp.zeros((cas, H ** 3), jnp.float32)
        cnt = jnp.zeros((cas, H ** 3), jnp.float32)
        for c in range(cas):
            val = val.at[c, idx[c]].add(sig[c])
            cnt = cnt.at[c, idx[c]].add(1.0)
        val = jax.lax.psum(val, axis_name)
        cnt = jax.lax.psum(cnt, axis_name)
        return jnp.where(cnt > 0.0, val / jnp.maximum(cnt, 1.0), -1.0)

    rng, k = jax.random.split(rng)
    tmp = jax.lax.cond(
        occ.iter_density < 16,
        lambda: merged(k, True),
        lambda: merged(k, False),
    )
    return _finish_update(occ, tmp, density_thresh, decay)


def mark_untrained_grid(occ, poses, intrinsics, bound):
    """Mark cells seen by no camera as -1 (reference renderer.py:408-471).

    poses: [B, 4, 4] c2w (numpy or jnp); intrinsics: (fx, fy, cx, cy).
    """
    H = GRID_SIZE
    cas = occ.density_grid.shape[0]
    fx, fy, cx, cy = intrinsics
    poses = jnp.asarray(poses, jnp.float32)

    idx = jnp.arange(H ** 3, dtype=jnp.int32)
    coords = _linear_coords(idx)
    grid = occ.density_grid

    for c in range(cas):
        xyz, half = _cell_centers(coords, c, bound)

        def chunk_covered(pts):
            # world -> cam: R^T (p - t) for every pose
            rel = pts[None, :, :] - poses[:, None, :3, 3]          # [B, N, 3]
            cam = jnp.einsum("bij,bnj->bni", poses[:, :3, :3].transpose(0, 2, 1), rel)
            mz = cam[..., 2] > 0
            mx = jnp.abs(cam[..., 0]) < cx / fx * cam[..., 2] + half * 2
            my = jnp.abs(cam[..., 1]) < cy / fy * cam[..., 2] + half * 2
            return jnp.any(mz & mx & my, axis=0)                    # [N]

        covered = jax.lax.map(chunk_covered, xyz.reshape(64, -1, 3)).reshape(-1)
        grid = grid.at[c].set(jnp.where(covered, grid[c], -1.0))

    return occ._replace(density_grid=grid)
