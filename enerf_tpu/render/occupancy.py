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
