"""Fixed-step stratified volume renderer (the framework's reference path).

Parity: reference nerf/renderer.py:150-278 (`NeRFRenderer.run`, the pure
PyTorch renderer used by all enerf configs, cuda_ray=False):
  - near/far from AABB slab test, near clamped to min_near
  - z_vals = linspace(near, far, num_steps), optional +-0.5*dt jitter
  - xyzs clipped to the AABB
  - optional PDF upsampling (renderer.py:196-228, sample_pdf :12-46)
  - deltas with trailing sample_dist, exclusive-cumprod transmittance
  - background: bg model at sphere(bg_radius), else provided bg_color,
    else white (renderer.py:258-265)

TPU design: one pure function of (params, rays, rng); T = num_steps is
static so the whole render is a single fused XLA program — the per-sample
field evaluation batches [N*T, .] through the MXU, and compositing is a
scan along the static sample axis.  Staged (chunked) rendering for big
images is a lax.map over ray blocks, not a Python loop with D2H syncs.
"""

import functools
from functools import partial

import jax
import jax.numpy as jnp

from enerf_tpu.ops.aabb import near_far_from_aabb, polar_from_ray
from enerf_tpu.ops.composite import composite_rays
from enerf_tpu.models.field import field_density, field_color, field_background


def sample_pdf(key, bins, weights, n_samples, det=False):
    """Inverse-CDF sampling of new z values (reference renderer.py:12-46).

    bins: [N, T]; weights: [N, T-1] -> [N, n_samples]
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [N, T]
    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    inds = jax.vmap(partial(jnp.searchsorted, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


@functools.partial(
    jax.jit,
    static_argnames=(
        "static", "num_steps", "upsample_steps", "perturb", "train",
        "min_near", "density_scale", "field_fns",
    ),
)
def render_rays(
    params,
    static,
    rays_o,
    rays_d,
    *,
    num_steps=128,
    upsample_steps=0,
    bg_color=1.0,
    perturb=False,
    rng=None,
    train=True,
    min_near=0.2,
    density_scale=1.0,
    field_fns=None,
):
    """Render a flat batch of rays.

    Args:
      params: field parameter pytree.
      static: FieldStatic.
      rays_o, rays_d: [N, 3].
      bg_color: scalar or [C] or [N, C] background (ignored if the field
        has a background model).
      rng: PRNGKey, required when perturb or stochastic upsampling.
      field_fns: optional (density_fn, color_fn) override with the same
        signatures as field_density / field_color — used by the golden
        tests to render an analytic field through the exact production
        sampling/composite pipeline (the role the reference's run() plays
        as an oracle for run_cuda).

    Returns:
      dict(image=[N, C], depth=[N], weights_sum=[N])
    """
    density_fn, color_fn = field_fns if field_fns is not None else (
        field_density, field_color)
    N = rays_o.shape[0]
    bound = static.bound
    aabb = jnp.asarray([-bound, -bound, -bound, bound, bound, bound], jnp.float32)

    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)  # [N]
    # Missed rays get near=far=FLT_MAX in the reference; to keep downstream
    # math finite we renormalize them to an empty [min_near, min_near] span
    # (weights become 0, so the pixel is pure background either way).
    miss = nears >= 1e30
    nears = jnp.where(miss, min_near, nears)
    fars = jnp.where(miss, min_near, fars)

    t = jnp.linspace(0.0, 1.0, num_steps)
    z_vals = nears[:, None] + (fars - nears)[:, None] * t[None, :]  # [N, T]
    sample_dist = (fars - nears)[:, None] / num_steps

    if rng is None:
        rng = jax.random.PRNGKey(0)
    k_pert, k_pdf = jax.random.split(rng)
    if perturb:
        z_vals = z_vals + (jax.random.uniform(k_pert, z_vals.shape) - 0.5) * sample_dist

    def make_xyzs(z):
        xyzs = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        return jnp.clip(xyzs, aabb[:3], aabb[3:])

    xyzs = make_xyzs(z_vals)  # [N, T, 3]
    sigmas, geo_feat = density_fn(params, static, xyzs.reshape(-1, 3))
    T_total = num_steps

    if upsample_steps > 0:
        # reference renderer.py:196-228 (no grad through the proposal)
        sig = jax.lax.stop_gradient(sigmas).reshape(N, num_steps)
        z = z_vals
        deltas = jnp.diff(z, axis=-1)
        deltas = jnp.concatenate([deltas, sample_dist * jnp.ones_like(deltas[..., :1])], -1)
        alphas = 1.0 - jnp.exp(-deltas * density_scale * sig)
        one_m = 1.0 - alphas + 1e-15
        trans = jnp.cumprod(
            jnp.concatenate([jnp.ones_like(one_m[..., :1]), one_m[..., :-1]], -1), -1
        )
        weights = alphas * trans
        z_mid = z[..., :-1] + 0.5 * deltas[..., :-1]
        new_z = sample_pdf(k_pdf, z_mid, weights[:, 1:-1], upsample_steps, det=not train)
        new_z = jax.lax.stop_gradient(new_z)
        new_xyzs = make_xyzs(new_z)
        new_sigmas, new_geo = density_fn(params, static, new_xyzs.reshape(-1, 3))

        T_total = num_steps + upsample_steps
        z_vals = jnp.concatenate([z_vals, new_z], axis=1)
        order = jnp.argsort(z_vals, axis=1)
        z_vals = jnp.take_along_axis(z_vals, order, axis=1)
        xyzs = jnp.take_along_axis(
            jnp.concatenate([xyzs, new_xyzs], axis=1), order[..., None], axis=1
        )
        sigmas = jnp.take_along_axis(
            jnp.concatenate([sigmas.reshape(N, -1), new_sigmas.reshape(N, -1)], axis=1),
            order, axis=1,
        ).reshape(-1)
        G = geo_feat.shape[-1]
        geo_feat = jnp.take_along_axis(
            jnp.concatenate(
                [geo_feat.reshape(N, num_steps, G), new_geo.reshape(N, upsample_steps, G)],
                axis=1,
            ),
            order[..., None], axis=1,
        ).reshape(-1, G)

    deltas = jnp.diff(z_vals, axis=-1)
    deltas = jnp.concatenate([deltas, sample_dist * jnp.ones_like(deltas[..., :1])], -1)

    dirs = jnp.broadcast_to(rays_d[:, None, :], (N, T_total, 3)).reshape(-1, 3)
    rgbs = color_fn(params, static, dirs, geo_feat)  # [N*T, C]
    C = rgbs.shape[-1]

    if static.bg_radius > 0:
        polar = polar_from_ray(rays_o, rays_d, static.bg_radius)
        bg = field_background(params, static, polar, rays_d)  # [N, C]
    else:
        bg = jnp.broadcast_to(jnp.asarray(bg_color, jnp.float32), (N, C))

    out = composite_rays(
        sigmas.reshape(N, T_total),
        rgbs.reshape(N, T_total, C),
        deltas,
        z_vals,
        nears,
        fars,
        bg,
        density_scale=density_scale,
    )
    return {"image": out["image"], "depth": out["depth"], "weights_sum": out["weights_sum"]}


def render_rays_staged(params, static, rays_o, rays_d, *, max_ray_batch=4096, **kw):
    """Chunked full-image rendering (reference renderer.py:579-594).

    Pads N up to a multiple of max_ray_batch and lax.map's the jitted
    renderer over chunks — one compiled program, no host round-trips.
    """
    N = rays_o.shape[0]
    B = int(max_ray_batch)
    n_chunks = -(-N // B)
    pad = n_chunks * B - N
    ro = jnp.concatenate([rays_o, jnp.ones((pad, 3), rays_o.dtype)], 0).reshape(n_chunks, B, 3)
    rd = jnp.concatenate([rays_d, jnp.ones((pad, 3), rays_d.dtype)], 0).reshape(n_chunks, B, 3)

    def chunk(args):
        o, d = args
        return render_rays(params, static, o, d, **kw)

    out = jax.lax.map(chunk, (ro, rd))
    return {
        "image": out["image"].reshape(n_chunks * B, -1)[:N],
        "depth": out["depth"].reshape(n_chunks * B)[:N],
        "weights_sum": out["weights_sum"].reshape(n_chunks * B)[:N],
    }
