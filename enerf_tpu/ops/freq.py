"""NeRF-style sinusoidal frequency positional encoding.

Parity: reference encoding.py:5-43 (FreqEncoder): [x, sin(f_i x), cos(f_i x)]
with log-sampled frequencies 2^0 .. 2^(multires-1), include_input=True.
"""

import numpy as np
import jax.numpy as jnp


def freq_encode(x, multires=6, include_input=True):
    """[..., D] -> [..., D * (1 + 2*multires)] (with include_input)."""
    freqs = 2.0 ** np.linspace(0.0, multires - 1, multires)
    out = [x] if include_input else []
    for f in freqs:
        out.append(jnp.sin(x * f))
        out.append(jnp.cos(x * f))
    return jnp.concatenate(out, axis=-1)


def freq_output_dim(input_dim, multires=6, include_input=True):
    return input_dim * (2 * multires + (1 if include_input else 0))
