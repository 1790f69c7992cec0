"""Morton (Z-order) encode/decode and density-grid bit packing.

Parity: reference raymarching/src/raymarching.cu:216-302 (__morton3D via
bit-expansion, __morton3D_invert, kernel_packbits thresholding 8 cells into
one byte).

TPU design: vectorized uint32 bit tricks on the VPU.  The bitfield is kept
as a uint8 array [CAS * 128^3 // 8] identical to the reference layout so the
occupancy-march kernels can index it the same way; a bool [CAS, 128^3] view
is used where byte packing is unnecessary on TPU.
"""

import jax.numpy as jnp


def _expand_bits(v):
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords):
    """[..., 3] int coords (each < 1024) -> [...] int32 Morton codes."""
    c = coords.astype(jnp.uint32)
    x = _expand_bits(c[..., 0])
    y = _expand_bits(c[..., 1])
    z = _expand_bits(c[..., 2])
    return (x | (y << 1) | (z << 2)).astype(jnp.int32)


def _compact_bits(v):
    v = v & jnp.uint32(0x49249249)
    v = (v | (v >> 2)) & jnp.uint32(0xC30C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0F00F00F)
    v = (v | (v >> 8)) & jnp.uint32(0xFF0000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x000003FF)
    return v


def morton3d_invert(indices):
    """[...] int32 Morton codes -> [..., 3] int32 coords."""
    i = indices.astype(jnp.uint32)
    return jnp.stack(
        [
            _compact_bits(i),
            _compact_bits(i >> 1),
            _compact_bits(i >> 2),
        ],
        axis=-1,
    ).astype(jnp.int32)


def packbits(grid, density_thresh):
    """[C, H^3] float density grid -> [C*H^3//8] uint8 bitfield.

    Bit i of byte n corresponds to cell 8n+i (reference kernel_packbits,
    raymarching.cu:270-302).
    """
    occ = (grid.reshape(-1, 8) > density_thresh).astype(jnp.uint8)
    shifts = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(occ * shifts[None, :], axis=-1, dtype=jnp.uint8)


def occupancy_bool(grid, density_thresh):
    """[C, H^3] float grid -> [C, H^3] bool occupancy (TPU-friendly view)."""
    return grid > density_thresh
