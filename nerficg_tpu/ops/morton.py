"""Morton (Z-order) encoding/decoding — fully vectorized jnp bit twiddling.

Reference equivalents:
  * morton3D / morton3D_invert CUDA kernels (30-bit, 10 bits/axis) used for
    occupancy-grid cell linearization (VolumeRenderingV2/csrc/raymarching.cu:35-121).
  * The standalone 63-bit MortonEncoding CUDA extension used for
    memory-coherent Gaussian sorting (CudaUtils/MortonEncoding/morton_encoding.cu:15-76).

On TPU these are elementwise integer ops on the VPU — no kernel needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ['morton3d', 'morton3d_invert', 'morton_encode_positions', 'packbits',
           'unpackbits']


def _expand_bits_10(v: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits to every 3rd bit (uint32)."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) int grid coords (<1024 per axis) -> (...,) 30-bit Morton codes
    (reference: raymarching.cu:35-75)."""
    x = _expand_bits_10(coords[..., 0])
    y = _expand_bits_10(coords[..., 1])
    z = _expand_bits_10(coords[..., 2])
    return (x | (y << 1) | (z << 2)).astype(jnp.uint32)


def _compact_bits_10(v: jnp.ndarray) -> jnp.ndarray:
    v = v.astype(jnp.uint32) & jnp.uint32(0x49249249)
    v = (v | (v >> 2)) & jnp.uint32(0xC30C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0F00F00F)
    v = (v | (v >> 8)) & jnp.uint32(0xFF0000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x000003FF)
    return v


def morton3d_invert(codes: jnp.ndarray) -> jnp.ndarray:
    """(...,) Morton codes -> (..., 3) grid coords (reference: raymarching.cu:77-121)."""
    codes = codes.astype(jnp.uint32)
    return jnp.stack([_compact_bits_10(codes),
                      _compact_bits_10(codes >> 1),
                      _compact_bits_10(codes >> 2)], axis=-1).astype(jnp.int32)


def _expand_bits_21(v: jnp.ndarray) -> jnp.ndarray:
    """Spread 21 bits to every 3rd bit (uint64 path via two uint32s is
    overkill; jnp supports uint64 when x64 enabled — fall back to float-safe
    uint32 hi/lo interleave)."""
    v = v.astype(jnp.uint64)
    v = (v | (v << 32)) & jnp.uint64(0x1F00000000FFFF)
    v = (v | (v << 16)) & jnp.uint64(0x1F0000FF0000FF)
    v = (v | (v << 8)) & jnp.uint64(0x100F00F00F00F00F)
    v = (v | (v << 4)) & jnp.uint64(0x10C30C30C30C30C3)
    v = (v | (v << 2)) & jnp.uint64(0x1249249249249249)
    return v


def morton_encode_positions(positions: jnp.ndarray,
                            aabb_min: jnp.ndarray,
                            aabb_max: jnp.ndarray) -> jnp.ndarray:
    """Normalized positions -> Morton codes for coherent sorting
    (reference: morton_encoding.cu:15-76, 63-bit).

    Without x64 mode, uses 30-bit codes (10 bits/axis) which is sufficient to
    sort millions of Gaussians coherently; with x64 enabled uses 63-bit.
    """
    norm = (positions - aabb_min) / jnp.maximum(aabb_max - aabb_min, 1e-12)
    norm = jnp.clip(norm, 0.0, 1.0 - 1e-7)
    use64 = jax.config.jax_enable_x64
    if use64:
        coords = (norm * (1 << 21)).astype(jnp.uint64)
        x = _expand_bits_21(coords[..., 0])
        y = _expand_bits_21(coords[..., 1])
        z = _expand_bits_21(coords[..., 2])
        return x | (y << 1) | (z << 2)
    coords = (norm * 1024.0).astype(jnp.int32)
    return morton3d(coords)


def packbits(grid: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Threshold a density grid -> uint8 bitfield (reference: raymarching.cu:123-160).

    grid: (..., N) with N divisible by 8. Returns (..., N//8) uint8.
    """
    bits = (grid > threshold).astype(jnp.uint8)
    shape = bits.shape[:-1] + (bits.shape[-1] // 8, 8)
    bits = bits.reshape(shape)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return jnp.sum(bits * weights, axis=-1).astype(jnp.uint8)


def unpackbits(bitfield: jnp.ndarray) -> jnp.ndarray:
    """uint8 bitfield -> boolean array, inverse of ``packbits``."""
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    bits = (bitfield[..., None] & weights) > 0
    return bits.reshape(bitfield.shape[:-1] + (bitfield.shape[-1] * 8,))
