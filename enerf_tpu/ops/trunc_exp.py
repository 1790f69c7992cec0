"""Truncated-gradient exponential density activation.

Parity: reference activation.py:5-18 (`_trunc_exp`): forward is exact exp in
fp32; backward clamps the *input* to [-15, 15] before exponentiating so huge
densities do not produce inf gradients.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
