"""Multi-resolution hash-grid encoding (Instant-NGP).

Reference equivalent: tiny-cuda-nn's HashGrid encoding consumed via
src/Thirdparty/TinyCudaNN.py and configured in
src/Methods/InstantNGP/Model.py:58-81 (16 levels x 2 features, 2^19 table,
base resolution 16, growing to a target resolution).

TPU-first design (SURVEY §2.12 N11): TPU has no scatter/gather hardware on
the XLA path (measured ~100ns/row, serial), so the production encode is
``hash_grid_encode_mxu``: a factored one-hot formulation whose forward and
backward are MXU matmuls executed by the Pallas kernels in ops/hash_mxu.py,
with trilinear corner weighting done in plain jnp around them. The plain
gather/scatter version (``hash_grid_encode``) is kept as the CPU/reference
path for tests.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

__all__ = ['HashGridConfig', 'init_hash_grid', 'hash_grid_encode',
           'hash_grid_encode_mxu', 'init_hash_grid_mxu']

# Spatial hashing primes (Instant-NGP convention).
_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridConfig:
    num_levels: int = 16
    features_per_level: int = 2
    log2_table_size: int = 19
    base_resolution: int = 16
    target_resolution: int = 2048
    # Windowed-encode stream hint (ops/hash_window.py): the sample stream is
    # block-expanded from a morton-sorted block set with this many samples
    # per block. Window stats are then taken over one anchor per block
    # instead of a per-sample min/max — per-sample morton keys are NOT
    # monotone across octant boundaries (a sample 0.02 away from its block
    # anchor can flip the top morton bit), so raw min/max windows are blown
    # up ~6x by those stragglers; anchor windows stay tight and stragglers
    # wrap into the window as one extra hash collision. 1 = per-sample
    # min/max (arbitrary streams).
    anchor_stride: int = 1

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def growth_factor(self) -> float:
        if self.num_levels <= 1:
            return 1.0
        return math.exp(math.log(self.target_resolution / self.base_resolution)
                        / (self.num_levels - 1))

    def level_resolutions(self) -> tuple[int, ...]:
        g = self.growth_factor
        return tuple(int(math.floor(self.base_resolution * (g ** l)))
                     for l in range(self.num_levels))


def init_hash_grid(rng: jax.Array, config: HashGridConfig) -> jnp.ndarray:
    """(L, T, F) table, uniform init in [-1e-4, 1e-4] (tcnn convention)."""
    return jax.random.uniform(
        rng, (config.num_levels, config.table_size, config.features_per_level),
        jnp.float32, -1e-4, 1e-4)


def _hash_coords(coords: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Spatial hash of integer grid coords (..., 3) -> (...,) table indices."""
    coords = coords.astype(jnp.uint32)
    h = coords[..., 0] * jnp.uint32(_PRIMES[0])
    h = h ^ (coords[..., 1] * jnp.uint32(_PRIMES[1]))
    h = h ^ (coords[..., 2] * jnp.uint32(_PRIMES[2]))
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


def _corner_indices_and_weights(positions: jnp.ndarray,
                                config: HashGridConfig
                                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """positions (N, 3) in [0,1] -> (idx (L, N*8) int32, weights (L, N, 8))."""
    n = positions.shape[0]
    resolutions = jnp.asarray(config.level_resolutions(), jnp.float32)
    scaled = positions[None, :, :] * (resolutions[:, None, None] - 1.0)
    floor = jnp.floor(scaled)
    frac = scaled - floor
    base = floor.astype(jnp.int32)
    corners = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], jnp.int32)
    corner_coords = base[:, :, None, :] + corners[None, None, :, :]  # (L,N,8,3)
    cf = corners.astype(jnp.float32)
    weights = jnp.prod(
        jnp.where(cf[None, None, :, :] > 0,
                  frac[:, :, None, :], 1.0 - frac[:, :, None, :]), axis=-1)
    idx = _hash_coords(corner_coords.astype(jnp.uint32), config.table_size)
    return idx.reshape(idx.shape[0], n * 8), weights


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_grid_encode_mxu(table: jnp.ndarray, positions: jnp.ndarray,
                         config: HashGridConfig) -> jnp.ndarray:
    """MXU-factored hash-grid encode (TPU-native path).

    table: (L, F, T/128, 128) float32 — the MXU layout (see ops/hash_mxu.py).
    positions: (N, 3) in the unit cube.
    Returns (N, L*F) features. Gradients flow to the table only.
    """
    out, _ = _encode_mxu_fwd(table, positions, config)
    return out


def _encode_mxu_fwd(table, positions, config):
    from nerficg_tpu.ops.hash_mxu import mxu_gather
    n = positions.shape[0]
    idx, weights = _corner_indices_and_weights(positions, config)
    gathered = mxu_gather(idx, table)                     # (L, F, N*8)
    levels, feats = table.shape[0], table.shape[1]
    g4 = gathered.reshape(levels, feats, n, 8)
    out = jnp.einsum('lfnc,lnc->nlf', g4, weights)
    return out.reshape(n, levels * feats), (idx, weights)


def _encode_mxu_bwd(config, residuals, g):
    from nerficg_tpu.ops.hash_mxu import mxu_scatter_add
    idx, weights = residuals
    levels = weights.shape[0]
    n = weights.shape[1]
    feats = g.shape[-1] // levels
    g3 = g.reshape(n, levels, feats)
    # Per-lookup cotangent: weight * output gradient, laid out (L, F, N*8).
    g_lookup = jnp.einsum('nlf,lnc->lfnc', g3, weights).reshape(
        levels, feats, n * 8)
    rows = config.table_size // 128
    dtable = mxu_scatter_add(idx, g_lookup, rows)
    return dtable, jnp.zeros((n, 3), g.dtype)


hash_grid_encode_mxu.defvjp(_encode_mxu_fwd, _encode_mxu_bwd)


def init_hash_grid_mxu(rng: jax.Array, config: HashGridConfig) -> jnp.ndarray:
    """(L, F, T/128, 128) table in the MXU layout."""
    assert config.table_size % 128 == 0, 'table size must be a multiple of 128'
    return jax.random.uniform(
        rng, (config.num_levels, config.features_per_level,
              config.table_size // 128, 128),
        jnp.float32, -1e-4, 1e-4)


def hash_grid_encode(table: jnp.ndarray, positions: jnp.ndarray,
                     config: HashGridConfig) -> jnp.ndarray:
    """Encode positions in [0, 1]^3 -> (N, L*F) features.

    table: (L, T, F) hash tables.
    positions: (N, 3) in the unit cube (caller normalizes by the scene AABB).
    """
    n = positions.shape[0]
    resolutions = jnp.asarray(config.level_resolutions(), jnp.float32)  # (L,)
    # Scaled coordinates per level: (L, N, 3).
    scaled = positions[None, :, :] * (resolutions[:, None, None] - 1.0)
    floor = jnp.floor(scaled)
    frac = scaled - floor                                    # (L, N, 3)
    base = floor.astype(jnp.int32)

    # 8 corner offsets: (8, 3).
    corners = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], jnp.int32)
    corner_coords = base[:, :, None, :] + corners[None, None, :, :]  # (L,N,8,3)
    # For trilinear weights: product over dims of (1-frac) or frac.
    cf = corners.astype(jnp.float32)                          # (8, 3)
    weights = jnp.prod(
        jnp.where(cf[None, None, :, :] > 0,
                  frac[:, :, None, :], 1.0 - frac[:, :, None, :]),
        axis=-1)                                              # (L, N, 8)

    idx = _hash_coords(corner_coords.astype(jnp.uint32),
                       config.table_size)                     # (L, N, 8)
    # Gather: one vmapped take per level dimension -> (L, N, 8, F).
    gathered = jax.vmap(lambda tab, ind: tab[ind])(table, idx)
    feats = jnp.sum(gathered * weights[..., None], axis=2)    # (L, N, F)
    return feats.transpose(1, 0, 2).reshape(n, config.output_dim)
