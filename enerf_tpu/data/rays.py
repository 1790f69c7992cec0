"""Ray generation from camera poses and intrinsics.

Parity: reference nerf/utils.py:111-174 (`get_rays`: pinhole back-projection
with normalized directions, optional error-map-weighted pixel sampling) and
:185-216 (`get_event_rays`: paired-pose rays sharing one pixel unprojection).

TPU design: pure jnp, shapes static; pixel-index sampling uses JAX PRNG keys
so the whole collate can run jit-compiled on device.
"""

import jax
import jax.numpy as jnp


def pixel_dirs_cam(xs, ys, intrinsics):
    """Unproject pixel coords to normalized camera-frame directions.

    xs, ys: [...] pixel coordinates; intrinsics: (fx, fy, cx, cy).
    Returns [..., 3] normalized directions (right-down-front convention).
    """
    fx, fy, cx, cy = intrinsics
    zs = jnp.ones_like(xs)
    us = (xs - cx) / fx
    vs = (ys - cy) / fy
    dirs = jnp.stack([us, vs, zs], axis=-1)
    return dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)


def get_rays_full(pose, intrinsics, H, W):
    """All-pixel rays for one pose: returns rays_o, rays_d [H*W, 3]."""
    j, i = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    dirs = pixel_dirs_cam(i.reshape(-1), j.reshape(-1), intrinsics)  # [HW, 3]
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_rays_sampled(key, pose, intrinsics, H, W, n_rays, error_map=None):
    """Sample n_rays random pixels for one pose.

    Returns dict(rays_o, rays_d [N,3], inds [N], and inds_coarse when
    error_map sampling is used — reference utils.py:134-156).
    """
    if error_map is None:
        inds = jax.random.randint(key, (n_rays,), 0, H * W)
        inds_coarse = None
    else:
        k1, k2, k3 = jax.random.split(key, 3)
        # weighted sample on the 128x128 error grid, then jitter to full res
        inds_coarse = jax.random.categorical(
            k1, jnp.log(error_map + 1e-12), shape=(n_rays,)
        )
        ix, iy = inds_coarse // 128, inds_coarse % 128
        sx, sy = H / 128.0, W / 128.0
        ix = jnp.clip((ix * sx + jax.random.uniform(k2, (n_rays,)) * sx).astype(jnp.int32), 0, H - 1)
        iy = jnp.clip((iy * sy + jax.random.uniform(k3, (n_rays,)) * sy).astype(jnp.int32), 0, W - 1)
        inds = ix * W + iy
    i = (inds % W).astype(jnp.float32)
    j = (inds // W).astype(jnp.float32)
    dirs = pixel_dirs_cam(i, j, intrinsics)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    out = {"rays_o": rays_o, "rays_d": rays_d, "inds": inds}
    if inds_coarse is not None:
        out["inds_coarse"] = inds_coarse
    return out


def get_event_rays(xs, ys, c2w_before, c2w_at, intrinsics):
    """Paired-pose rays for events (reference utils.py:185-216).

    xs, ys: [N] pixel coords; c2w_before/c2w_at: [N, 3, 4] per-event poses.
    Returns dict(rays_evs_o1/d1/o2/d2: [N, 3]).
    """
    dirs = pixel_dirs_cam(xs, ys, intrinsics)  # [N, 3]
    # d[n,k] = sum_d R[n,k,d] * dir[n,d]  (reference utils.py:209)
    d1 = jnp.einsum("nkd,nd->nk", c2w_before[..., :3, :3], dirs)
    d2 = jnp.einsum("nkd,nd->nk", c2w_at[..., :3, :3], dirs)
    return {
        "rays_evs_o1": c2w_before[..., :3, 3],
        "rays_evs_d1": d1,
        "rays_evs_o2": c2w_at[..., :3, 3],
        "rays_evs_d2": d2,
    }
