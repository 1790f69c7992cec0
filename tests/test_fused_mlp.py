"""Fused Pallas field head vs the unfused reference path."""

import numpy as np
import jax
import jax.numpy as jnp

from enerf_tpu.models.field import (
    FieldStatic, init_field_params, field_forward, field_forward_fused,
)


def setup(compute_dtype=jnp.float32):
    static = FieldStatic(
        bound=1.0, out_dim_color=3, num_levels=4, log2_hashmap_size=10,
        compute_dtype=compute_dtype,
    )
    params = init_field_params(jax.random.PRNGKey(0), static)
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (700, 3), minval=-1, maxval=1)
    d = jax.random.normal(jax.random.PRNGKey(2), (700, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return static, params, x, d


def test_fused_matches_unfused_forward():
    static, params, x, d = setup()
    s_ref, c_ref = field_forward(params, static, x, d)
    s_f, c_f = field_forward_fused(params, static, x, d)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_ref), rtol=1e-5, atol=1e-6)


def test_fused_gradients_match():
    static, params, x, d = setup()

    def loss_ref(p):
        s, c = field_forward(p, static, x, d)
        return jnp.mean(s) + jnp.sum(c ** 2)

    def loss_fused(p):
        s, c = field_forward_fused(p, static, x, d)
        return jnp.mean(s) + jnp.sum(c ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_f = jax.grad(loss_fused)(params)
    for k in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_f[k]), np.asarray(g_ref[k]), rtol=1e-4, atol=1e-5,
            err_msg=f"grad mismatch for {k}",
        )


def test_fused_trunc_exp_grad_clamped():
    """Large sigma logits must yield the clamped trunc_exp gradient."""
    static, params, x, d = setup()
    # inflate sigma weights so sigma_raw > 15 for some points
    params = dict(params)
    params["sigma_w1"] = params["sigma_w1"].at[:, 0].multiply(4000.0)

    def loss_fused(p):
        s, _ = field_forward_fused(p, static, x, d)
        return jnp.sum(s)

    g = jax.grad(loss_fused)(params)
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), f"non-finite grad in {k}"
