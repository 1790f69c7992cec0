"""Independent numpy oracle implementations for kernel unit tests.

These re-derive the documented semantics of the reference CUDA kernels
(instant-ngp hash encoding, volume compositing) as slow scalar loops, so the
vectorized TPU ops can be validated against a second implementation.
"""

import numpy as np

PRIMES = (1, 2654435761, 805459861)


def hash_encode_oracle(x01, table, meta):
    """Scalar-loop hash-grid encode following gridencoder.cu semantics."""
    N, D = x01.shape
    L, C = meta.num_levels, meta.level_dim
    out = np.zeros((N, L, C), np.float64)
    for n in range(N):
        if np.any((x01[n] < 0) | (x01[n] > 1)):
            continue
        for lvl in range(L):
            scale = np.exp2(lvl * np.log2(meta.per_level_scale)) * meta.base_resolution - 1.0
            res = int(np.ceil(scale)) + 1
            size = int(meta.sizes[lvl])
            off = int(meta.offsets[lvl])
            pos = x01[n].astype(np.float32) * np.float32(scale) + 0.5
            pg = np.floor(pos).astype(np.int64)
            frac = pos - pg
            for corner in range(2 ** D):
                w = 1.0
                pl = np.zeros(D, np.int64)
                for d in range(D):
                    if (corner >> d) & 1:
                        w *= frac[d]
                        pl[d] = pg[d] + 1
                    else:
                        w *= 1.0 - frac[d]
                        pl[d] = pg[d]
                # index
                stride = 1
                index = 0
                for d in range(D):
                    if stride > size:
                        break
                    index += int(pl[d]) * stride
                    stride *= res + 1
                if meta.gridtype == "hash" and stride > size:
                    h = 0
                    for d in range(D):
                        h = h ^ ((int(pl[d]) * PRIMES[d]) % (2 ** 32))  # uint32 wrap
                    index = int(h % (2 ** 32))
                index = index % size
                out[n, lvl] += w * np.asarray(table)[off + index]
    return out.reshape(N, L * C)


def composite_oracle(sigmas, rgbs, deltas, z_vals, nears, fars, bg, density_scale=1.0):
    """Scalar-loop volume compositing following renderer.py run() semantics."""
    N, T = sigmas.shape
    C = rgbs.shape[-1]
    image = np.zeros((N, C))
    depth = np.zeros(N)
    wsum = np.zeros(N)
    for n in range(N):
        Tacc = 1.0
        for t in range(T):
            alpha = 1.0 - np.exp(-deltas[n, t] * density_scale * sigmas[n, t])
            w = alpha * Tacc
            Tacc *= 1.0 - alpha + 1e-15
            oz = np.clip((z_vals[n, t] - nears[n]) / (fars[n] - nears[n]), 0, 1)
            depth[n] += w * oz
            image[n] += w * rgbs[n, t]
            wsum[n] += w
        image[n] += (1.0 - wsum[n]) * np.asarray(bg)[n] if np.ndim(bg) > 0 else (1.0 - wsum[n]) * bg
    return image, depth, wsum


def march_oracle(ro, rd, bitfield, near, far, bound, cascades, max_steps=1024,
                 num_samples=64, grid_size=128):
    """Scalar-loop occupancy march following kernel_march_rays_train semantics."""
    import math

    SQRT3 = 1.7320508075688772
    dt_min = 2 * SQRT3 / max_steps
    H = grid_size

    def mip_from_val(v):
        if v <= 0:
            return 0
        e = math.frexp(v)[1]
        return min(cascades - 1, max(0, e))

    ts_out, dts_out = [], []
    t = near
    steps = 0
    while t < far and len(ts_out) < num_samples and steps < 100000:
        steps += 1
        pos = np.clip(ro + t * rd, -bound, bound)
        dt = dt_min  # dt_gamma == 0
        lvl = max(mip_from_val(np.abs(pos).max()), mip_from_val(dt * H * 0.5))
        mb = min(2.0 ** lvl, bound)
        n = np.clip((0.5 * (pos / mb + 1) * H).astype(np.int64), 0, H - 1)
        cell = lvl * H ** 3 + n[0] * H * H + n[1] * H + n[2]
        if bitfield.reshape(-1)[cell]:
            ts_out.append(t)
            dts_out.append(dt)
            t += dt
        else:
            with np.errstate(divide="ignore", invalid="ignore"):
                nb = (((n + 0.5 + 0.5 * np.sign(rd)) / (H - 1) * 2 - 1) * mb - pos) / rd
            nb = np.where(np.isnan(nb), np.inf, nb)
            tt = t + max(0.0, nb.min())
            # do-while semantics (raymarching.cu:397-399): ALWAYS advance
            # at least one dt, else a ray sitting exactly on a voxel
            # boundary (tt == t) spins to the step cap with no progress
            t += dt
            while t < tt:
                t += dt
    return np.asarray(ts_out), np.asarray(dts_out)
