"""Volume-rendering compositing along rays (static-shape, differentiable).

Parity: reference nerf/renderer.py:230-265 (PyTorch `run()` path):
  alpha_i  = 1 - exp(-delta_i * density_scale * sigma_i)
  T_i      = prod_{j<i} (1 - alpha_j + 1e-15)
  weight_i = alpha_i * T_i
  image    = sum_i w_i rgb_i + (1 - sum_i w_i) * bg
  depth    = sum_i w_i * clip((z_i - near)/(far - near), 0, 1)
and the closed-form-gradient CUDA composite kernels
(raymarching.cu:501-693), whose backward here falls out of autodiff of the
same formula (XLA differentiates the cumulative product/sum scans without
the O(T^2) blowup, using the same suffix-sum structure).

TPU design: everything stays [N, T] with T static; the transmittance is an
exclusive scan along the sample axis — no per-ray dynamic early exit, masked
lanes instead.
"""

import jax.numpy as jnp


def composite_weights(sigmas, deltas, density_scale=1.0):
    """Per-sample compositing weights.

    Args:
      sigmas: [N, T] densities.
      deltas: [N, T] step sizes.
      density_scale: scalar multiplier on sigma (reference renderer.py:202).

    Returns:
      weights [N, T], alphas [N, T].
    """
    alphas = 1.0 - jnp.exp(-deltas * density_scale * sigmas)
    # exclusive cumprod of (1 - alpha + 1e-15): reference renderer.py:233-234
    one_m = 1.0 - alphas + 1e-15
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(one_m[..., :1]), one_m[..., :-1]], axis=-1),
        axis=-1,
    )
    weights = alphas * trans
    return weights, alphas


def composite_rays(sigmas, rgbs, deltas, z_vals, nears, fars, bg_color,
                   density_scale=1.0):
    """Composite per-sample sigma/rgb into per-ray image/depth.

    Args:
      sigmas: [N, T]; rgbs: [N, T, C]; deltas, z_vals: [N, T]
      nears, fars: [N]; bg_color: broadcastable to [N, C] (or scalar)

    Returns:
      dict(image=[N, C], depth=[N], weights_sum=[N], weights=[N, T])
    """
    weights, _ = composite_weights(sigmas, deltas, density_scale)
    weights_sum = jnp.sum(weights, axis=-1)
    # rays that miss the AABB carry fars == nears (renderer sets both to
    # min_near); guard the 0/0 so depth stays finite, like march.py's
    # near_safe/far_safe
    span = jnp.maximum((fars - nears)[:, None], 1e-6)
    ori_z = jnp.clip((z_vals - nears[:, None]) / span, 0.0, 1.0)
    depth = jnp.sum(weights * ori_z, axis=-1)
    image = jnp.sum(weights[..., None] * rgbs, axis=-2)
    image = image + (1.0 - weights_sum)[..., None] * bg_color
    return {
        "image": image,
        "depth": depth,
        "weights_sum": weights_sum,
        "weights": weights,
    }
