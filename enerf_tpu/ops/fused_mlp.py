"""Fused field-MLP Pallas kernel — the ffmlp role, TPU-native.

Parity: reference ffmlp/src/ffmlp.cu (tiny-cuda-nn style fully-fused MLP:
the whole multi-layer half-precision MLP in one kernel, activations kept in
shared memory, WMMA tensor-core fragments).  On TPU the analogue keeps every
weight matrix resident in VMEM and runs the full head — sigma net (2 layers)
-> density + geo features -> concat SH direction encoding -> color net
(3 layers) -> sigmoid — in ONE pallas_call, with all matmuls on the MXU in
bf16 and fp32 accumulation, no HBM round-trips between layers.

Training uses a custom VJP whose backward recomputes activations with plain
XLA matmuls (the role the reference fills with CUTLASS split-k GEMMs,
ffmlp.cu:802-877); forward inference is the fused kernel.  Numerics match
the unfused jnp path to bf16 tolerance (tested in interpret mode on CPU and
compiled on TPU).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_B = 512


def _interpret():
    return os.environ.get("ENERF_TPU_INTERPRET", "0") == "1"


def _head_math(enc, denc, ws0, ws1, wc0, wc1, wc2):
    """The shared forward math (used by both kernel and reference path).

    enc: [B, E] position encoding; denc: [B, D] direction encoding.
    Returns (sigma_raw [B], rgb [B, C]).
    """
    h = jnp.dot(enc, ws0, preferred_element_type=jnp.float32)
    h = jnp.maximum(h, 0.0).astype(enc.dtype)
    sg = jnp.dot(h, ws1, preferred_element_type=jnp.float32)  # [B, 1+G]
    sigma_raw = sg[:, 0]
    geo = sg[:, 1:].astype(enc.dtype)
    cin = jnp.concatenate([denc, geo], axis=-1)
    c = jnp.dot(cin, wc0, preferred_element_type=jnp.float32)
    c = jnp.maximum(c, 0.0).astype(enc.dtype)
    c = jnp.dot(c, wc1, preferred_element_type=jnp.float32)
    c = jnp.maximum(c, 0.0).astype(enc.dtype)
    c = jnp.dot(c, wc2, preferred_element_type=jnp.float32)
    rgb = jax.nn.sigmoid(c)
    return sigma_raw, rgb


def _kernel(enc_ref, denc_ref, ws0_ref, ws1_ref, wc0_ref, wc1_ref, wc2_ref,
            sigma_ref, rgb_ref):
    sigma_raw, rgb = _head_math(
        enc_ref[:], denc_ref[:], ws0_ref[:], ws1_ref[:],
        wc0_ref[:], wc1_ref[:], wc2_ref[:],
    )
    sigma_ref[:] = jnp.exp(sigma_raw)[:, None]  # trunc_exp forward
    rgb_ref[:] = rgb


def _fused_forward(enc, denc, ws0, ws1, wc0, wc1, wc2):
    B = enc.shape[0]
    C = wc2.shape[1]
    nb = -(-B // BLOCK_B)
    pad = nb * BLOCK_B - B
    encp = jnp.pad(enc, ((0, pad), (0, 0)))
    dencp = jnp.pad(denc, ((0, pad), (0, 0)))

    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((BLOCK_B, enc.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, denc.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for w in (ws0, ws1, wc0, wc1, wc2)
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    sigma, rgb = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb * BLOCK_B, 1), jnp.float32),
            jax.ShapeDtypeStruct((nb * BLOCK_B, C), jnp.float32),
        ],
        interpret=_interpret(),
    )(encp, dencp, ws0, ws1, wc0, wc1, wc2)
    return sigma[:B, 0], rgb[:B]


@jax.custom_vjp
def fused_field_head(enc, denc, ws0, ws1, wc0, wc1, wc2):
    """Fused sigma+color head: (enc [B,E], denc [B,D], weights) ->
    (sigma [B], rgb [B,C]).  Weights bias-free, reference network.py dims."""
    return _fused_forward(enc, denc, ws0, ws1, wc0, wc1, wc2)


def _ref_forward(enc, denc, ws0, ws1, wc0, wc1, wc2):
    """Unfused reference path (bwd recompute + numerics oracle)."""
    sigma_raw, rgb = _head_math(enc, denc, ws0, ws1, wc0, wc1, wc2)
    return jnp.exp(sigma_raw), rgb


def _fwd(enc, denc, *weights):
    out = fused_field_head(enc, denc, *weights)
    return out, (enc, denc) + tuple(weights)


def _bwd(res, cots):
    enc, denc, *weights = res
    # recompute-based backward with plain XLA matmuls; trunc_exp's clamped
    # gradient (activation.py:5-18) comes from differentiating the
    # reference path with the clamp applied.
    def f(enc, denc, *ws):
        sigma_raw, rgb = _head_math(enc, denc, *ws)
        # trunc_exp semantics (activation.py:5-18): forward exp(x), grad
        # g * exp(clamp(x, -15, 15)).  Differentiating exp(clip(x)) would
        # instead ZERO the gradient outside the clamp (clip has zero
        # slope) — use the op with the reference's custom VJP.
        from enerf_tpu.ops.trunc_exp import trunc_exp
        sigma = trunc_exp(sigma_raw)
        return sigma, rgb

    _, vjp = jax.vjp(f, enc, denc, *weights)
    return vjp(cots)


fused_field_head.defvjp(_fwd, _bwd)
