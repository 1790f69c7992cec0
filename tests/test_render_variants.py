"""Renderer variant coverage: bg model, PDF upsampling, dt_gamma march."""

import numpy as np
import jax
import jax.numpy as jnp

from enerf_tpu.models.field import FieldStatic, init_field_params, field_background
from enerf_tpu.render.renderer import render_rays
from enerf_tpu.render.march import march_rays
from enerf_tpu.render.occupancy import GRID_SIZE, init_occupancy
from enerf_tpu.ops.aabb import near_far_from_aabb


def _rays(n=32, seed=1):
    d = jax.random.normal(jax.random.PRNGKey(seed), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (n, 1))
    return o, d


def test_background_model_path():
    """bg_radius > 0: background comes from the 2D-hashgrid bg net
    (reference network.py:79-101, renderer.py:258-261)."""
    static = FieldStatic(
        bound=1.0, out_dim_color=3, num_levels=4, log2_hashmap_size=10,
        bg_radius=4.0,
    )
    params = init_field_params(jax.random.PRNGKey(0), static)
    assert "bg_table" in params and "bg_w0" in params

    o, d = _rays()
    out = render_rays(params, static, o, d, num_steps=16, perturb=False, train=False)
    img = np.asarray(out["image"])
    assert img.shape == (32, 3) and np.isfinite(img).all()
    # bg net influences the image: perturbing bg params changes misses
    params2 = dict(params)
    params2["bg_w1"] = params["bg_w1"] + 1.0
    out2 = render_rays(params2, static, o, d, num_steps=16, perturb=False, train=False)
    assert np.abs(np.asarray(out2["image"]) - img).max() > 1e-4

    # grads flow into the bg net
    g = jax.grad(lambda p: jnp.sum(
        render_rays(p, static, o, d, num_steps=16, perturb=False, train=False)["image"]
    ))(params)
    assert np.abs(np.asarray(g["bg_table"])).max() > 0


def test_pdf_upsampling_path():
    """upsample_steps > 0: importance-sampled extra z values
    (reference renderer.py:196-228)."""
    static = FieldStatic(bound=1.0, out_dim_color=1, num_levels=4, log2_hashmap_size=10)
    params = init_field_params(jax.random.PRNGKey(0), static)
    o, d = _rays(16)
    out = render_rays(
        params, static, o, d, num_steps=16, upsample_steps=16,
        perturb=True, rng=jax.random.PRNGKey(3), train=True,
    )
    assert np.isfinite(np.asarray(out["image"])).all()
    # deterministic upsampling at eval
    o1 = render_rays(params, static, o, d, num_steps=16, upsample_steps=8,
                     perturb=False, train=False)
    o2 = render_rays(params, static, o, d, num_steps=16, upsample_steps=8,
                     perturb=False, train=False)
    np.testing.assert_allclose(np.asarray(o1["image"]), np.asarray(o2["image"]))

    g = jax.grad(lambda p: jnp.sum(render_rays(
        p, static, o, d, num_steps=16, upsample_steps=8,
        perturb=False, train=True, rng=jax.random.PRNGKey(0))["image"]))(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))


def test_march_dt_gamma():
    """dt_gamma > 0: adaptive (growing) step sizes, clamped to [dt_min, dt_max]."""
    H = GRID_SIZE
    occ = init_occupancy(1.0)
    bitfield = jnp.ones_like(occ.occ_bitfield)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (8, 1))
    # aim at the box: forward + small jitter
    d = jnp.asarray([[0.0, 0.0, 1.0]]) + 0.2 * jax.random.normal(
        jax.random.PRNGKey(1), (8, 3)
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    nears, fars = near_far_from_aabb(o, d, aabb, 0.2)
    ts, dts, valid = march_rays(
        o, d, bitfield, nears, fars, jax.random.PRNGKey(0),
        num_samples=32, max_steps=1024, cascades=1, bound=1.0, dt_gamma=0.01,
    )
    dts = np.asarray(dts)
    valid = np.asarray(valid)
    dt_min = 2 * 1.7320508 / 1024
    hit = valid.any(axis=1)
    assert hit.any()
    v = dts[valid]
    assert (v >= dt_min - 1e-6).all()
    # later samples take larger steps than the first ones on some ray
    for i in np.nonzero(hit)[0]:
        vs = dts[i][valid[i]]
        if len(vs) > 4 and vs[-1] > vs[0] + 1e-6:
            break
    else:
        raise AssertionError("dt_gamma produced no growing steps")
