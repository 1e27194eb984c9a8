"""Generic crossbar flat-table gather (TPU) + bit-packed occupancy probes.

The only fast random-access primitive on TPU is the intra-row lane crossbar
(``tpu.dynamic_gather``, see PERF_NOTES.md).  ``xbar_gather`` implements an
arbitrary-extent gather from a VMEM-resident flat table by looping over the
table's 128-lane rows: broadcast row r, crossbar the lanes, select where
(idx >> 7) == r.  Measured 8.9 G-lookups/s at extent 1024 and 7.2 G/s at
4096 on a v5e.

``occupancy_probe`` packs a boolean grid into uint32 words so the gather
extent shrinks 32x (a 32^3 skip grid becomes 1024 words = 8 rows), then
tests the bit in-lane.  This replaces the round-1 MXU one-hot probe
(ops/occupancy.py occupancy_lookup_mxu), which paid extent MACs per probe.

Reference equivalent: the occupancy bitfield probes inside the CUDA
marchers (/root/reference/src/Methods/InstantNGP/VolumeRenderingV2/csrc/
raymarching.cu:166-456, grid bit tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['xbar_gather', 'xbar_permute', 'pack_bits', 'occupancy_probe',
           'build_block_bitfield', 'block_probe_cells', 'block_table_rows']

_LANES = 128
_TILE = 65536          # lookups per grid step


def _gather_kernel(pos_ref, tab_ref, out_ref, *, rows):
    idx = pos_ref[:]                                  # (S, 128) int32
    row = jnp.right_shift(idx, 7)
    lane = jnp.bitwise_and(idx, _LANES - 1)
    s = idx.shape[0]

    def body(r, acc):
        rowvals = jax.lax.broadcast_in_dim(
            tab_ref[pl.ds(r, 1), :], (s, _LANES), (0, 1))
        g = jnp.take_along_axis(rowvals, lane, axis=1)
        return jnp.where(row == r, g, acc)

    out_ref[:] = jax.lax.fori_loop(
        0, rows, body, jnp.zeros((s, _LANES), idx.dtype))


def xbar_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table (R, 128) int32/float32, idx (N,) int32 in [0, R*128) ->
    (N,) gathered values.  TPU: Pallas crossbar; elsewhere: plain take."""
    if jax.default_backend() != 'tpu':
        return table.reshape(-1)[idx]
    rows = table.shape[0]
    n = idx.shape[0]
    tile = _TILE if n >= _TILE else n + ((-n) % 2048)
    pad = (-n) % tile
    idx_p = jnp.pad(idx, (0, pad)).reshape((n + pad) // _LANES, _LANES)
    s_tiles = tile // _LANES
    n_tiles = (n + pad) // tile
    # gather as int32 lanes regardless of payload dtype (bitcast around)
    tab_i = table if table.dtype == jnp.int32 else \
        jax.lax.bitcast_convert_type(table, jnp.int32)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, rows=rows),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((s_tiles, _LANES), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s_tiles, _LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((n + pad) // _LANES, _LANES),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(idx_p, tab_i).reshape(-1)[:n]
    if table.dtype != jnp.int32:
        out = jax.lax.bitcast_convert_type(out, table.dtype)
    return out


def _permute_kernel(idx_ref, tab_ref, out_ref, *, rows, cols):
    idx = idx_ref[:]                                  # (S, 128) int32
    row = jnp.right_shift(idx, 7)
    lane = jnp.bitwise_and(idx, _LANES - 1)
    s = idx.shape[0]

    def body(r, acc):
        hit = row == r
        new = []
        for c in range(cols):
            rowvals = jax.lax.broadcast_in_dim(
                tab_ref[c, pl.ds(r, 1), :], (s, _LANES), (0, 1))
            g = jnp.take_along_axis(rowvals, lane, axis=1)
            new.append(jnp.where(hit, g, acc[c]))
        return tuple(new)

    out = jax.lax.fori_loop(
        0, rows, body,
        tuple(jnp.zeros((s, _LANES), idx.dtype) for _ in range(cols)))
    for c in range(cols):
        out_ref[c] = out[c]


def xbar_permute(mat: jnp.ndarray, idx: jnp.ndarray,
                 col_group: int = 8) -> jnp.ndarray:
    """Row permutation / gather of a matrix: ``mat[idx]`` for (N, C) mat.

    Multi-channel crossbar scan — the TPU answer to reordering a sorted
    stream's channels without a payload sort: ``lax.sort`` with many payload
    operands runs fine (~1 ms) but takes MINUTES to compile on this stack
    (measured 494 s for 26 operands), while each extra channel here is one
    more crossbar gather inside the same row scan. Bit-exact for any dtype
    (values move as int32 bits). Cost ~ rows(N/128) x C x 3 VPU ops.
    """
    if jax.default_backend() != 'tpu':
        return mat[idx]
    n, c = mat.shape
    assert idx.shape == (n,)
    pad_n = (-n) % (8 * _LANES)
    m = n + pad_n
    rows = m // _LANES
    groups = -(-c // col_group)
    c_pad = groups * col_group
    tab = jnp.pad(mat, ((0, pad_n), (0, c_pad - c)))
    tab = jax.lax.bitcast_convert_type(tab, jnp.int32) \
        if mat.dtype != jnp.int32 else tab
    tab = tab.T.reshape(c_pad, rows, _LANES)
    idx_p = jnp.pad(idx, (0, pad_n)).reshape(rows, _LANES)
    out = pl.pallas_call(
        functools.partial(_permute_kernel, rows=rows, cols=col_group),
        grid=(groups,),
        in_specs=[
            pl.BlockSpec((rows, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((col_group, rows, _LANES), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((col_group, rows, _LANES),
                               lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c_pad, rows, _LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(idx_p, tab)
    out = out.reshape(c_pad, m).T[:n, :c]
    if mat.dtype != jnp.int32:
        out = jax.lax.bitcast_convert_type(out, mat.dtype)
    return out


def pack_bits(flags: jnp.ndarray) -> jnp.ndarray:
    """(M,) bool/0-1 -> (ceil(M/32/128), 128) int32 bitfield, little-endian
    bits within each word (bit b of word w = flag[w*32+b]).

    Reference equivalent: the ``packbits`` CUDA kernel
    (csrc/raymarching.cu:123-160)."""
    m = flags.shape[0]
    pad = (-m) % (32 * _LANES)
    f = jnp.pad(flags.astype(jnp.uint32), (0, pad)).reshape(-1, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    words = jnp.sum(f * weights[None, :], axis=1, dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(words, jnp.int32).reshape(-1, _LANES)


def occupancy_probe_xyz(packed: jnp.ndarray, ux: jnp.ndarray,
                        uy: jnp.ndarray, uz: jnp.ndarray,
                        resolution: int) -> jnp.ndarray:
    """Bit-packed occupancy test from per-axis unit coordinate PLANES.

    Plane form is the fast path: trailing (..., 3) coordinate vectors force
    lane-hostile tiled layouts around the gather kernel (measured 1.6 ms of
    pure relayout copies at 8192x64x3 in the marcher), while same-shaped 2D
    planes fuse cleanly."""
    cx = jnp.clip((ux * resolution).astype(jnp.int32), 0, resolution - 1)
    cy = jnp.clip((uy * resolution).astype(jnp.int32), 0, resolution - 1)
    cz = jnp.clip((uz * resolution).astype(jnp.int32), 0, resolution - 1)
    flat = (cx * resolution + cy) * resolution + cz
    shape = flat.shape
    flat = flat.reshape(-1)
    words = xbar_gather(packed, jnp.right_shift(flat, 5))
    bits = jnp.bitwise_and(
        jnp.right_shift(words, jnp.bitwise_and(flat, 31)), 1)
    return (bits == 1).reshape(shape)


def occupancy_probe(packed: jnp.ndarray, positions_unit: jnp.ndarray,
                    resolution: int) -> jnp.ndarray:
    """Bit-packed occupancy test of positions in [0,1]^3.

    packed: output of pack_bits over the flat (res^3,) occupancy flags.
    Returns (...,) bool."""
    return occupancy_probe_xyz(packed, positions_unit[..., 0],
                               positions_unit[..., 1],
                               positions_unit[..., 2], resolution)


# =============================================================================
# Two-level rank-compacted block bitfield: sub-linear occupancy probes.
#
# The dense probe above scans the packed bitfield linearly (res^3/32/128
# rows), which is what made 128^3 marching a measured NET loss in round 3
# (PERF_NOTES: 512 rows/cascade vs 64 at 64^3). Here the grid is split into
# 8^3-cell blocks (512 bits = 16 words each) and only OCCUPIED blocks keep
# their fine words, packed contiguously in block-rank order:
#
#   coarse : 1 bit/block  (res=128 -> 4096 bits = 128 words = 1 row)
#   rank   : per coarse word, # occupied blocks in preceding words (1 row)
#   compact: cap_blocks * 16 words of fine bits, rank-ordered
#
# probe = 2 one-row gathers + popcount (block rank) + one gather over the
# compact table -> cost scales with the OCCUPIED volume (capped), not the
# grid extent. Blocks whose rank overflows cap_blocks conservatively report
# occupied (the skip grid is an optimization; unskipped samples are merely
# re-tested by the density MLP), so any cap is correct.
#
# Reference equivalent: the occupancy bitfield of the CUDA marcher at its
# full 128^3 per-cascade resolution (/root/reference/src/Methods/InstantNGP/
# Model.py:16 RESOLUTION=128; csrc/raymarching.cu:166-331 grid bit tests).
# =============================================================================

_BLOCK = 8                      # cells per block side (512 bits = 16 words)
_BLOCK_WORDS = _BLOCK ** 3 // 32


def block_table_rows(resolution: int, cap_blocks: int,
                     num_grids: int = 1) -> tuple:
    """(coarse_rows, rank_rows, compact_rows) of the packed layout."""
    b = resolution // _BLOCK
    nb = num_grids * b ** 3
    nw = -(-nb // 32)
    cr = -(-nw // _LANES)
    return cr, cr, cap_blocks * _BLOCK_WORDS // _LANES


def build_block_bitfield(flags: jnp.ndarray, resolution: int,
                         cap_blocks: int, num_grids: int = 1) -> jnp.ndarray:
    """(num_grids * res^3,) bool flags -> packed two-level table.

    Returns ONE (rows, 128) int32 array [coarse | rank | compact] so it can
    ride existing single-array plumbing (sharded-step broadcast, caching).
    ``cap_blocks`` must be a multiple of 8 (so the compact table fills whole
    128-lane rows).
    """
    assert resolution % _BLOCK == 0
    assert cap_blocks % (_LANES // _BLOCK_WORDS) == 0
    r = resolution
    b = r // _BLOCK
    nb = num_grids * b ** 3
    f = flags.reshape(num_grids, b, _BLOCK, b, _BLOCK, b, _BLOCK)
    f = f.transpose(0, 1, 3, 5, 2, 4, 6).reshape(nb, _BLOCK ** 3)
    f = f.astype(jnp.uint32)
    block_occ = f.max(axis=1) > 0                              # (nb,)
    weights = jnp.left_shift(jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32))
    words = jnp.sum(f.reshape(nb, _BLOCK_WORDS, 32) * weights[None, None],
                    axis=-1, dtype=jnp.uint32)                 # (nb, 16)

    nw = -(-nb // 32)
    occ_pad = jnp.pad(block_occ.astype(jnp.uint32), (0, nw * 32 - nb))
    coarse_words = jnp.sum(occ_pad.reshape(nw, 32) * weights[None],
                           axis=-1, dtype=jnp.uint32)          # (nw,)
    popc = jax.lax.population_count(coarse_words).astype(jnp.int32)
    rank_words = jnp.cumsum(popc) - popc                       # exclusive

    # Rank-ordered compaction; overflow blocks land on the dropped tail row.
    block_rank = jnp.cumsum(block_occ.astype(jnp.int32)) - 1   # inclusive-1
    dest = jnp.where(block_occ & (block_rank < cap_blocks),
                     block_rank, cap_blocks)
    compact = jnp.zeros((cap_blocks + 1, _BLOCK_WORDS), jnp.uint32)
    compact = compact.at[dest].set(words, mode='drop')[:cap_blocks]

    cr, rr, fr = block_table_rows(resolution, cap_blocks, num_grids)

    def to_rows(x, rows):
        x = x.reshape(-1)
        x = jnp.pad(x, (0, rows * _LANES - x.shape[0]))
        return x.reshape(rows, _LANES)

    out = jnp.concatenate([
        to_rows(jax.lax.bitcast_convert_type(coarse_words, jnp.int32), cr),
        to_rows(rank_words, rr),
        to_rows(jax.lax.bitcast_convert_type(compact, jnp.int32), fr),
    ], axis=0)
    return out


def block_probe_cells(table: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray,
                      cz: jnp.ndarray, grid_index, resolution: int,
                      cap_blocks: int, num_grids: int = 1) -> jnp.ndarray:
    """Occupancy of integer cell coords (already clipped to [0, res)).

    grid_index: per-probe grid/cascade selector (int array or 0).
    Cost: two gathers over the tiny coarse/rank rows + one over the
    compact rows — sub-linear in grid extent.
    """
    cr, rr, fr = block_table_rows(resolution, cap_blocks, num_grids)
    coarse = table[:cr]
    rank = table[cr:cr + rr]
    compact = table[cr + rr:cr + rr + fr]
    b = resolution // _BLOCK
    blk_local = ((cx >> 3) * b + (cy >> 3)) * b + (cz >> 3)
    blk = grid_index * (b ** 3) + blk_local
    shape = blk.shape
    blk = blk.reshape(-1)
    w = jnp.right_shift(blk, 5)
    bit = jnp.bitwise_and(blk, 31)
    cw = xbar_gather(coarse, w)
    rk = xbar_gather(rank, w)
    occ_blk = jnp.bitwise_and(jnp.right_shift(cw, bit), 1) == 1
    cw_u = jax.lax.bitcast_convert_type(cw, jnp.uint32)
    below = jnp.left_shift(jnp.uint32(1), bit.astype(jnp.uint32)) \
        - jnp.uint32(1)
    rank_blk = rk + jax.lax.population_count(
        cw_u & below).astype(jnp.int32)
    overflow = rank_blk >= cap_blocks
    within = (((cx & 7) * _BLOCK + (cy & 7)) * _BLOCK + (cz & 7)).reshape(-1)
    safe = jnp.minimum(rank_blk, cap_blocks - 1) * _BLOCK_WORDS + \
        jnp.right_shift(within, 5)
    fword = xbar_gather(compact, safe)
    fine = jnp.bitwise_and(
        jnp.right_shift(fword, jnp.bitwise_and(within, 31)), 1) == 1
    return (occ_blk & (fine | overflow)).reshape(shape)
