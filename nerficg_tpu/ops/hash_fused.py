"""Fully-fused multiresolution hash-grid encode for TPU.

The unfused pipeline (ops/hashgrid.py + ops/hash_mxu.py) materializes the
corner indices (L, N, 8, 3), trilinear weights (L, N, 8), and gathered
features (L, F, N*8) in HBM between the jnp hash computation and the Pallas
gather — ~4.7 GB of temp traffic per 262k-sample Instant-NGP step (measured
via XLA cost analysis: 27.9 GB accessed/step). This module fuses the whole
encode into the Pallas kernels: positions go in, interpolated features come
out, and the hash arithmetic, one-hot construction, per-corner MXU gathers,
and trilinear reduction all stay in VMEM.

Forward (per level l, per tile of TILE_N samples):
  for each of 8 cell corners:
    hash the integer corner coords (uint32 multiply/xor, VPU),
    split the table index into (row, lane) = (idx >> 7, idx & 127),
    gather rows with a one-hot MXU matmul, select lanes with a one-hot
    mask, and accumulate weight * value into the output features.

Backward mirrors it: the per-corner cotangent w * g is scattered into the
table with the transposed one-hot matmul, accumulated across the grid in
the output block (Pallas revisiting), so the only residual saved for the
VJP is the (N, 3) positions.

Reference equivalent: tiny-cuda-nn's HashGrid encoding (consumed via
src/Thirdparty/TinyCudaNN.py; SURVEY §2.12 N11). The CUDA version leans on
L2-cached random gathers; TPUs have no per-lane gather, so the one-hot
matmul *is* the gather, at table_size MACs per lookup — which is why the
per-level table defaults to 2^14 instead of tcnn's 2^19.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerficg_tpu.ops.hashgrid import (HashGridConfig,
                                      _corner_indices_and_weights)

__all__ = ['hash_encode_fused', 'TILE_N']

TILE_N = 4096      # samples per kernel step (VMEM-bounded)
LANES = 128

_PRIMES = (1, 2654435761, 805459861)
_CORNERS = tuple((i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1))


def _corner_hash(base_u32, frac, corner, table_size):
    """In-kernel spatial hash + trilinear weight of one cell corner.

    base_u32: 3x(1, T) uint32 floor coords; frac: 3x(1, T) f32.
    Returns (hi, lo) int32 (1, T) row/lane indices and w (1, T) f32.
    """
    ox, oy, oz = corner
    h = base_u32[0] + jnp.uint32(ox)          # prime for x is 1
    hy = (base_u32[1] + jnp.uint32(oy)) * jnp.uint32(_PRIMES[1])
    hz = (base_u32[2] + jnp.uint32(oz)) * jnp.uint32(_PRIMES[2])
    idx = ((h ^ hy ^ hz) & jnp.uint32(table_size - 1)).astype(jnp.int32)
    hi = idx >> 7
    lo = idx & (LANES - 1)
    w = ((frac[0] if ox else 1.0 - frac[0]) *
         (frac[1] if oy else 1.0 - frac[1]) *
         (frac[2] if oz else 1.0 - frac[2]))
    return hi, lo, w


def _split_pos(pos_ref, res_ref):
    """Shared preamble: scaled coords -> integer base (u32) + fraction."""
    res_minus_1 = res_ref[pl.program_id(0), 0]
    pos = pos_ref[:]                                       # (3, T) f32
    scaled = pos * res_minus_1
    floor = jnp.floor(scaled)
    frac_all = scaled - floor
    # Mosaic has no f32->u32 cast; go through i32 (floor >= 0 here).
    base = floor.astype(jnp.int32).astype(jnp.uint32)
    bases = tuple(base[d:d + 1] for d in range(3))
    fracs = tuple(frac_all[d:d + 1] for d in range(3))
    return bases, fracs


def _fwd_kernel(res_ref, pos_ref, table_ref, out_ref, *, num_features,
                rows, table_size):
    bases, fracs = _split_pos(pos_ref, res_ref)
    tile = pos_ref.shape[1]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (rows, tile), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, tile), 0)
    tables = [table_ref[0, f].astype(jnp.bfloat16) for f in range(num_features)]
    acc = [jnp.zeros((1, tile), jnp.float32) for _ in range(num_features)]
    for corner in _CORNERS:
        hi, lo, w = _corner_hash(bases, fracs, corner, table_size)
        a_t = (iota_r == hi).astype(jnp.bfloat16)          # (R, T)
        b_t = (iota_l == lo).astype(jnp.float32)           # (128, T)
        bw = b_t * w                                       # fold weight in
        for f in range(num_features):
            c_t = jax.lax.dot_general(
                tables[f], a_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (128, T)
            acc[f] += jnp.sum(c_t * bw, axis=0, keepdims=True)
    for f in range(num_features):
        out_ref[0, f] = acc[f][0]


def _bwd_kernel(res_ref, pos_ref, g_ref, out_ref, *, num_features, rows,
                table_size):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    bases, fracs = _split_pos(pos_ref, res_ref)
    tile = pos_ref.shape[1]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (rows, tile), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, tile), 0)
    gs = [g_ref[0, f].reshape(1, tile) for f in range(num_features)]
    for corner in _CORNERS:
        hi, lo, w = _corner_hash(bases, fracs, corner, table_size)
        a_t = (iota_r == hi).astype(jnp.bfloat16)          # (R, T)
        b_t = (iota_l == lo).astype(jnp.float32)           # (128, T)
        for f in range(num_features):
            bg_t = (b_t * (w * gs[f])).astype(jnp.bfloat16)
            d_t = jax.lax.dot_general(
                a_t, bg_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (R, 128)
            out_ref[0, f] += d_t


def _level_resolutions_arr(config: HashGridConfig) -> jnp.ndarray:
    """(L, 1) f32 of (resolution - 1) per level, for SMEM prefetch."""
    res = jnp.asarray(config.level_resolutions(), jnp.float32) - 1.0
    return res.reshape(-1, 1)


def _pad_pos(positions_t: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    n = positions_t.shape[1]
    padded = ((n + TILE_N - 1) // TILE_N) * TILE_N
    if padded != n:
        positions_t = jnp.pad(positions_t, ((0, 0), (0, padded - n)))
    return positions_t, n


def _fused_fwd_pallas(table: jnp.ndarray, positions: jnp.ndarray,
                      config: HashGridConfig) -> jnp.ndarray:
    """table (L, F, R, 128), positions (N, 3) in [0,1) -> (N, L*F)."""
    levels, num_features, rows, lanes = table.shape
    assert lanes == LANES
    pos_t, n = _pad_pos(positions.T)
    m = pos_t.shape[1]
    kernel = functools.partial(_fwd_kernel, num_features=num_features,
                               rows=rows, table_size=config.table_size)
    out = pl.pallas_call(
        kernel,
        grid=(levels, m // TILE_N),
        in_specs=[
            pl.BlockSpec((levels, 1), lambda l, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, TILE_N), lambda l, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_features, rows, LANES),
                         lambda l, i: (l, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, num_features, TILE_N),
                               lambda l, i: (l, 0, i)),
        out_shape=jax.ShapeDtypeStruct((levels, num_features, m), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(_level_resolutions_arr(config), pos_t, table)
    # (L, F, N) -> (N, L*F); the transpose fuses into the consumer matmul.
    return out.reshape(levels * num_features, m)[:, :n].T

def _fused_bwd_pallas(table_shape, positions: jnp.ndarray, g: jnp.ndarray,
                      config: HashGridConfig) -> jnp.ndarray:
    levels, num_features, rows, lanes = table_shape
    pos_t, n = _pad_pos(positions.T)
    m = pos_t.shape[1]
    g_t = g.T.reshape(levels, num_features, n)             # (L, F, N)
    if m != n:
        g_t = jnp.pad(g_t, ((0, 0), (0, 0), (0, m - n)))
    kernel = functools.partial(_bwd_kernel, num_features=num_features,
                               rows=rows, table_size=config.table_size)
    return pl.pallas_call(
        kernel,
        grid=(levels, m // TILE_N),
        in_specs=[
            pl.BlockSpec((levels, 1), lambda l, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, TILE_N), lambda l, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_features, TILE_N), lambda l, i: (l, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, num_features, rows, LANES),
                               lambda l, i: (l, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((levels, num_features, rows, LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(_level_resolutions_arr(config), pos_t, g_t)


# -- jnp fallback (CPU / interpret): identical semantics --------------------------

def _fused_fwd_jnp(table, positions, config):
    levels, num_features = table.shape[0], table.shape[1]
    n = positions.shape[0]
    idx, weights = _corner_indices_and_weights(positions, config)  # (L, N*8)
    flat = table.reshape(levels, num_features, -1)
    gathered = jax.vmap(lambda tab, ind: tab[:, ind])(flat, idx)
    g4 = gathered.reshape(levels, num_features, n, 8)
    out = jnp.einsum('lfnc,lnc->nlf', g4, weights)
    return out.reshape(n, levels * num_features)


def _fused_bwd_jnp(table_shape, positions, g, config):
    levels, num_features, rows, lanes = table_shape
    n = positions.shape[0]
    idx, weights = _corner_indices_and_weights(positions, config)
    g3 = g.reshape(n, levels, num_features)
    g_lookup = jnp.einsum('nlf,lnc->lfnc', g3, weights).reshape(
        levels, num_features, n * 8)

    def per_level(ind, grad):
        def per_feature(gf):
            return jnp.zeros((rows * lanes,), gf.dtype).at[ind].add(gf)
        return jax.vmap(per_feature)(grad)

    return jax.vmap(per_level)(idx, g_lookup).reshape(table_shape)


# -- public differentiable API -----------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode_fused(table: jnp.ndarray, positions: jnp.ndarray,
                      config: HashGridConfig) -> jnp.ndarray:
    """Fused hash-grid encode: (L, F, T/128, 128) table + (N, 3) unit
    positions -> (N, L*F) features. Gradients flow to the table only."""
    if jax.default_backend() == 'tpu':
        return _fused_fwd_pallas(table, positions, config)
    return _fused_fwd_jnp(table, positions, config)


def _hef_fwd(table, positions, config):
    return hash_encode_fused(table, positions, config), \
        (positions, table.shape)


def _hef_bwd(config, residuals, g):
    positions, table_shape = residuals
    if jax.default_backend() == 'tpu':
        dtable = _fused_bwd_pallas(table_shape, positions, g, config)
    else:
        dtable = _fused_bwd_jnp(table_shape, positions, g, config)
    return dtable, jnp.zeros_like(positions)


hash_encode_fused.defvjp(_hef_fwd, _hef_bwd)
