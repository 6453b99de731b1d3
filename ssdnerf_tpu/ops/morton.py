"""Morton (Z-order) coding and density-bitfield packing.

Vectorized integer-arithmetic equivalents of the CUDA kernels
``kernel_morton3D`` / ``kernel_morton3D_invert`` / ``kernel_packbits``
(/root/reference/lib/ops/raymarching/src/raymarching.cu:212-300).  The
occupancy grid keeps the reference's Morton memory layout so that cached
scene states are interoperable.
"""
import numpy as np
import jax.numpy as jnp


def _u32(x):
    return jnp.uint32(x)


def _expand_bits(v):
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = (v * _u32(0x00010001)) & _u32(0xFF0000FF)
    v = (v * _u32(0x00000101)) & _u32(0x0F00F00F)
    v = (v * _u32(0x00000011)) & _u32(0xC30C30C3)
    v = (v * _u32(0x00000005)) & _u32(0x49249249)
    return v


def morton3d(coords):
    """Interleave 3D integer coords into Morton indices.

    Args:
        coords: (..., 3) int32 in [0, 1024).
    Returns:
        (...,) int32 Morton codes.
    """
    c = coords.astype(jnp.uint32)
    return (_expand_bits(c[..., 0]) | (_expand_bits(c[..., 1]) << 1)
            | (_expand_bits(c[..., 2]) << 2)).astype(jnp.int32)


def _compact_bits(v):
    v = v & _u32(0x49249249)
    v = (v | (v >> 2)) & _u32(0xC30C30C3)
    v = (v | (v >> 4)) & _u32(0x0F00F00F)
    v = (v | (v >> 8)) & _u32(0xFF0000FF)
    v = (v | (v >> 16)) & _u32(0x000003FF)
    return v


def morton3d_invert(indices):
    """Inverse of :func:`morton3d`. (...,) int32 -> (..., 3) int32."""
    i = indices.astype(jnp.uint32)
    return jnp.stack([
        _compact_bits(i), _compact_bits(i >> 1), _compact_bits(i >> 2)
    ], axis=-1).astype(jnp.int32)


def morton_grid_indices(grid_size):
    """Host-side (numpy) Morton codes for a full grid, shape (H, H, H).

    ``morton_grid_indices(H)[x, y, z]`` is the Morton index of voxel (x,y,z).
    Used to build the permutation between linear and Morton layouts once, as
    a compile-time constant.
    """
    r = np.arange(grid_size, dtype=np.uint64)

    def expand(v):
        v = (v * np.uint64(0x00010001)) & np.uint64(0xFF0000FF)
        v = (v * np.uint64(0x00000101)) & np.uint64(0x0F00F00F)
        v = (v * np.uint64(0x00000011)) & np.uint64(0xC30C30C3)
        v = (v * np.uint64(0x00000005)) & np.uint64(0x49249249)
        return v

    ex = expand(r)
    return (ex[:, None, None] | (ex[None, :, None] << np.uint64(1))
            | (ex[None, None, :] << np.uint64(2))).astype(np.int32)


def packbits(grid, thresh):
    """Pack a density grid into a bitfield: bit i of byte b corresponds to
    grid element ``b * 8 + i`` (matches raymarching.cu:263-300).

    Args:
        grid: (..., N) float density grid (N divisible by 8), Morton order.
        thresh: scalar threshold (may be traced).
    Returns:
        (..., N // 8) uint8 bitfield.
    """
    occ = (grid > thresh).astype(jnp.uint8).reshape(grid.shape[:-1] + (-1, 8))
    weights = (1 << jnp.arange(8, dtype=jnp.uint32)).astype(jnp.uint8)
    return (occ * weights).sum(axis=-1).astype(jnp.uint8)


def unpackbits(bitfield):
    """Inverse of :func:`packbits` -> (..., N) bool occupancy."""
    bits = (bitfield[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
    return bits.reshape(bitfield.shape[:-1] + (-1,)).astype(jnp.bool_)
