"""Ray/AABB intersection and background-sphere polar coordinates.

Parity: reference raymarching/src/raymarching.cu:94-158
(kernel_near_far_from_aabb: slab test, miss -> FLT_MAX, near clamped to
min_near) and :165-199 (kernel_polar_from_ray: larger sphere-intersection
root, y-up polar coords normalized to [-1, 1]).

TPU design: pure vectorized jnp; branchless min/max slab test.
"""

import numpy as np
import jax.numpy as jnp

# FLT_MAX, matches the CUDA kernel.  A plain numpy scalar: a jnp scalar
# here would initialize the XLA backend at import time, which breaks
# jax.distributed.initialize on pod slices (parallel/multihost.py).
_MISS = np.float32(3.4028234663852886e38)


def near_far_from_aabb(rays_o, rays_d, aabb, min_near=0.2):
    """Slab-test ray/AABB intersection.

    Args:
      rays_o, rays_d: [..., 3]
      aabb: [6] (xmin, ymin, zmin, xmax, ymax, zmax)
      min_near: minimum near distance.

    Returns:
      nears, fars: [...]; both FLT_MAX when the ray misses the box.
    """
    rd = 1.0 / rays_d  # inf on zero components, like the CUDA kernel
    t0 = (aabb[:3] - rays_o) * rd  # [..., 3]
    t1 = (aabb[3:] - rays_o) * rd
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    # Robustness over the reference: a box entirely behind the ray origin
    # (far < 0) is also a miss.  The CUDA kernel would return
    # (min_near, far<min_near) there, which yields negative step sizes and
    # negative compositing weights downstream.
    miss = (near > far) | (far < min_near)
    near = jnp.maximum(near, min_near)
    near = jnp.where(miss, _MISS, near)
    far = jnp.where(miss, _MISS, far)
    return near, far


def polar_from_ray(rays_o, rays_d, radius):
    """Polar coords (theta, phi) of the ray/background-sphere intersection.

    Returns [..., 2] in [-1, 1] (theta over [0, pi) -> [-1, 1), phi over
    [-pi, pi) -> [-1, 1)), y-up convention.
    """
    A = jnp.sum(rays_d * rays_d, axis=-1)
    B = jnp.sum(rays_o * rays_d, axis=-1)
    C = jnp.sum(rays_o * rays_o, axis=-1) - radius * radius
    t = (-B + jnp.sqrt(jnp.maximum(B * B - A * C, 0.0))) / A
    p = rays_o + t[..., None] * rays_d
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    theta = jnp.arctan2(jnp.sqrt(x * x + z * z), y)
    phi = jnp.arctan2(z, x)
    return jnp.stack([2.0 * theta / jnp.pi - 1.0, phi / jnp.pi], axis=-1)
