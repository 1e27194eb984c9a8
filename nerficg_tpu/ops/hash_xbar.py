"""Crossbar multiresolution hash-grid encode for TPU (generation 2).

Replaces the one-hot-matmul encode (ops/hash_fused.py) on the hot path.
Reference equivalent: tiny-cuda-nn's HashGrid encoding consumed via
src/Thirdparty/TinyCudaNN.py, configured in
src/Methods/InstantNGP/Model.py:58-81.

Why this design (measured on a TPU v5e, see PERF_NOTES.md):
- XLA's native gather/scatter/sort are ~0.05-0.15 G-lookups/s on TPU (each
  gathered row is padded to 128 lanes; scatter serializes) — 100x too slow.
- The one MOSAIC primitive that is fast is the intra-row lane crossbar
  (``tpu.dynamic_gather`` via jnp.take_along_axis axis=1): 21 G-lookups/s,
  extent 128.
- Extent beyond 128 is bought with a sublane loop: broadcast table row r,
  crossbar-gather lanes, select where (idx >> 7) == r.  Measured 8.9 G/s at
  extent 1024, 7.2 G/s at 4096 (33.5M lookups in 3.8-4.7 ms).
- The backward (scatter-add) has no fast primitive at all; it is computed as
  an MXU matmul: dtable = A_w^T M with A_w[j,r] = w_j g_j [row_j == r] and
  M[j,c] = [lane_j == c], built per 128-lookup lane-row (one-hot transposes
  are lane-major so construction is 16 VPU ops per (128,128) block).

Cost model (262144 samples/step, 16 levels):
- exact 8-corner forward:   ~0.1 VPU-cycles/lookup at extent 4096.
- exact 8-corner backward:  ~0.5 cycles/lookup (one-hot materialization).
- stochastic 1-corner (training): 8x fewer lookups.  Sampling the corner
  with probability = its trilinear weight makes the encode an unbiased
  estimator of the trilinear interpolation (E[T[base+o]] = trilerp since
  the interpolation is linear in the corner values), and the gradient to
  the table is the exact gradient of the sampled estimator.  Inference
  always uses the exact 8-corner path.

Tables are stored exactly like the one-hot encode — (L, F=2, R, 128)
float32 — so checkpoints and the optimizer are unchanged.  Inside the
kernel the two features of a level are packed into one uint32 lane
(bf16 hi | bf16 lo) so each crossbar gather fetches both features; the
bf16<->f32 conversion is free bit masking (bf16 is the top half of f32).

Per-level extents: levels whose dense grid fits the table cap store the
grid densely (linear indexing, collision-free, matching tcnn's behaviour);
finer levels use the Instant-NGP spatial hash.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerficg_tpu.ops.hashgrid import HashGridConfig

__all__ = ['hash_encode_xbar', 'hash_encode_xbar_stochastic',
           'hash_encode_xbar_posgrad', 'hash_encode_xbar_stochastic_posgrad',
           'level_layout', 'XBAR_TILE_N']

XBAR_TILE_N = 65536         # samples per grid step (large tiles amortize
                            # per-row loop overhead: 16-sublane tiles measured
                            # 9x slower per lookup than 512-sublane tiles)
_LANES = 128
_P1 = np.uint32(2654435761)
_P2 = np.uint32(805459861)
_CORNERS = tuple((i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1))


# ---------------------------------------------------------------------------
# level layout: per-level resolution / extent / dense flag
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def level_layout(config: HashGridConfig):
    """Per-level (res-1, rows, dense) + global row count R_max.

    A level is dense (linear indexing, no collisions) when its full grid of
    (res+1)^3 corners fits within the configured table cap; its row count is
    then ceil((res+1)^3 / 128).  Hash levels use the full pow2 cap.
    """
    cap = config.table_size
    res = config.level_resolutions()
    res_m1, rows, dense = [], [], []
    for r in res:
        pts = (r + 1) ** 3 if r < 2048 else cap + 1  # avoid overflow
        if pts <= cap:
            dense.append(1)
            rows.append((pts + _LANES - 1) // _LANES)
        else:
            dense.append(0)
            rows.append(cap // _LANES)
        res_m1.append(float(r - 1))
    r_max = max(rows)
    return (tuple(res_m1), tuple(rows), tuple(dense), r_max)


def _scalar_args(config: HashGridConfig):
    res_m1, rows, dense, r_max = level_layout(config)
    res_arr = jnp.asarray(res_m1, jnp.float32).reshape(-1, 1)
    rows_arr = jnp.asarray(rows, jnp.int32).reshape(-1, 1)
    dense_arr = jnp.asarray(dense, jnp.int32).reshape(-1, 1)
    return res_arr, rows_arr, dense_arr, r_max


def _pack_table(table: jnp.ndarray) -> jnp.ndarray:
    """(L, 2, R, 128) f32 -> (L, R, 128) uint32 [bf16(f0) | bf16(f1)]."""
    f0 = jax.lax.bitcast_convert_type(
        table[:, 0].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    f1 = jax.lax.bitcast_convert_type(
        table[:, 1].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return (f0 << 16) | f1


def _tile_n(n: int) -> int:
    """Adaptive tile: full XBAR_TILE_N when the batch is large, otherwise
    the padded batch itself (small inference chunks / tests)."""
    if n >= XBAR_TILE_N:
        return XBAR_TILE_N
    return n + ((-n) % 2048)


def _prep_positions(positions: jnp.ndarray, tile_n: int):
    """(N,3) -> (3, n_tiles*S, 128) + n (S = tile_n//128)."""
    n = positions.shape[0]
    pad = (-n) % tile_n
    p = jnp.pad(positions, ((0, pad), (0, 0)))
    m = n + pad
    pt = p.T.reshape(3, m // _LANES, _LANES)
    return pt, n, m


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------

def _kernel_coords(pos, res_m1):
    """pos (3,S,128) block -> per-dim base (u32) and frac (f32) (S,128)."""
    scaled = pos * res_m1
    floor = jnp.floor(scaled)
    frac = scaled - floor
    base = floor.astype(jnp.int32)        # >= 0 by clamped input
    return base, frac


def _corner_index(base, corner, res1_i, dense, rows):
    """Level-aware index of one integer corner -> (row, lane) int32."""
    bx = base[0] + corner[0]
    by = base[1] + corner[1]
    bz = base[2] + corner[2]
    # dense: linear index in the (res+1)^3 grid
    lin = bx + by * res1_i + bz * res1_i * res1_i
    # hash: Instant-NGP spatial hash, masked to rows*128 (pow2 for hash lvls)
    ux = bx.astype(jnp.uint32)
    uy = by.astype(jnp.uint32)
    uz = bz.astype(jnp.uint32)
    h = (ux ^ (uy * _P1) ^ (uz * _P2)).astype(jnp.int32)
    h = jnp.bitwise_and(h, rows * _LANES - 1)
    idx = jnp.where(dense != 0, lin, h)
    return jnp.right_shift(idx, 7), jnp.bitwise_and(idx, _LANES - 1)


def _unpack(v):
    """uint32 packed pair -> (f0, f1) f32 (bf16 = top half of f32)."""
    f0 = pltpu.bitcast(jnp.bitwise_and(v, jnp.uint32(0xFFFF0000)),
                       jnp.float32)
    f1 = pltpu.bitcast(jnp.left_shift(v, 16), jnp.float32)
    return f0, f1


def _trilinear_w(frac, corner):
    w = (frac[0] if corner[0] else 1.0 - frac[0])
    w = w * (frac[1] if corner[1] else 1.0 - frac[1])
    w = w * (frac[2] if corner[2] else 1.0 - frac[2])
    return w


def _stoch_corners(frac, n_corners: int):
    """Variance-reduced stochastic trilinear interpolation.

    Per (sample, level), log2(n_corners) dimensions are interpolated
    EXACTLY (the highest-variance dims, by m_d = min(f_d, 1-f_d)) and the
    remaining dims sample their corner ~ Bernoulli(f_d).  Unbiased for the
    trilinear interpolation for any n (linearity); n=1 is the plain
    single-corner sampler, n=2 removes the dominant variance dim, n=4
    leaves only the LEAST-variance dim stochastic.

    Returns (corners, weights): n_corners per-dim (S,128) int offsets and
    their exact partial-lerp weights.  24-bit uniform compare is exact
    in f32.
    """
    offs = []
    for d in range(3):
        bits = pltpu.prng_random_bits(frac[d].shape)
        u24 = jnp.right_shift(pltpu.bitcast(bits, jnp.uint32), 8)
        u = pltpu.bitcast(u24, jnp.int32).astype(jnp.float32) \
            * (1.0 / 16777216.0)
        offs.append((u < frac[d]).astype(jnp.int32))
    if n_corners == 1:
        return [tuple(offs)], [jnp.ones_like(frac[0])]

    m = [jnp.minimum(f, 1.0 - f) for f in frac]
    if n_corners == 2:
        # exact dim = argmax m
        k0 = (m[0] >= m[1]) & (m[0] >= m[2])
        k1 = jnp.logical_not(k0) & (m[1] >= m[2])
        k2 = jnp.logical_not(k0) & jnp.logical_not(k1)
        exact = [k0, k1, k2]
    else:
        assert n_corners == 4
        # stochastic dim = argmin m; exact = the other two
        s0 = (m[0] <= m[1]) & (m[0] <= m[2])
        s1 = jnp.logical_not(s0) & (m[1] <= m[2])
        s2 = jnp.logical_not(s0) & jnp.logical_not(s1)
        exact = [jnp.logical_not(s0), jnp.logical_not(s1),
                 jnp.logical_not(s2)]
    # Enumerated bit for each exact dim: dim d takes enumeration bit equal
    # to its rank among the exact dims (0 = lowest exact dim index).
    first = [exact[0],
             exact[1] & jnp.logical_not(exact[0]),
             exact[2] & jnp.logical_not(exact[0]) & jnp.logical_not(exact[1])]
    corners, weights = [], []
    n_bits = 1 if n_corners == 2 else 2
    for c in range(n_corners):
        bit = [(c >> 0) & 1, (c >> 1) & 1]
        corner, w = [], jnp.ones_like(frac[0])
        for d in range(3):
            enum_d = jnp.where(first[d], bit[0], bit[n_bits - 1])
            o_d = jnp.where(exact[d], enum_d, offs[d])
            corner.append(o_d)
            w_d = jnp.where(o_d == 1, frac[d], 1.0 - frac[d])
            w = w * jnp.where(exact[d], w_d, 1.0)
        corners.append(tuple(corner))
        weights.append(w)
    return corners, weights


def _corner_set(frac3, n_corners: int):
    """Corners + weights + per-dim lerp factors and their frac-derivatives.

    n_corners == 0 -> exact 8-corner trilinear; otherwise the stochastic
    estimator of _stoch_corners.  factors[c][d] is the dim-d weight factor
    of corner c (1 for Bernoulli-sampled dims) and dfactors[c][d] its
    derivative wrt frac_d (+-1 for interpolated dims, 0 for sampled dims —
    the pathwise/straight-through position gradient).
    """
    ones = jnp.ones_like(frac3[0])
    if n_corners == 0:
        corners = list(_CORNERS)
        weights, factors, dfactors = [], [], []
        for cc in corners:
            fs = [frac3[d] if cc[d] else 1.0 - frac3[d] for d in range(3)]
            dfs = [ones if cc[d] else -ones for d in range(3)]
            weights.append(fs[0] * fs[1] * fs[2])
            factors.append(fs)
            dfactors.append(dfs)
        return corners, weights, factors, dfactors
    corners, weights = _stoch_corners(frac3, n_corners)
    factors, dfactors = [], []
    for cc in corners:
        fs, dfs = [], []
        for d in range(3):
            o_d = cc[d]
            w_d = jnp.where(o_d == 1, frac3[d], 1.0 - frac3[d])
            s_d = jnp.where(o_d == 1, 1.0, -1.0)
            if n_corners == 1:
                fs.append(ones)
                dfs.append(jnp.zeros_like(ones))
            else:
                # interpolated dims carry their lerp factor; sampled dims
                # contribute factor 1 and no pathwise derivative. A dim is
                # interpolated iff its factor participates in the weight —
                # recover that by comparing weights (cheap + exact): handled
                # by the caller passing exact masks is avoided by recomputing
                # the same argmax/argmin masks here.
                fs.append(w_d)
                dfs.append(s_d)
        factors.append(fs)
        dfactors.append(dfs)
    if n_corners in (2, 4):
        # Recompute the exact-dim masks (same pure function of frac).
        m = [jnp.minimum(f, 1.0 - f) for f in frac3]
        if n_corners == 2:
            k0 = (m[0] >= m[1]) & (m[0] >= m[2])
            k1 = jnp.logical_not(k0) & (m[1] >= m[2])
            k2 = jnp.logical_not(k0) & jnp.logical_not(k1)
            exact = [k0, k1, k2]
        else:
            s0 = (m[0] <= m[1]) & (m[0] <= m[2])
            s1 = jnp.logical_not(s0) & (m[1] <= m[2])
            s2 = jnp.logical_not(s0) & jnp.logical_not(s1)
            exact = [jnp.logical_not(s0), jnp.logical_not(s1),
                     jnp.logical_not(s2)]
        for c in range(len(corners)):
            for d in range(3):
                factors[c][d] = jnp.where(exact[d], factors[c][d], 1.0)
                dfactors[c][d] = jnp.where(exact[d], dfactors[c][d], 0.0)
    return corners, weights, factors, dfactors


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(res_ref, rows_ref, dense_ref, seed_ref, pos_ref, tab_ref,
                out_ref, *, n_corners: int, s_tiles: int):
    lvl = pl.program_id(0)
    tile = pl.program_id(1)
    res_m1 = res_ref[lvl, 0]
    rows = rows_ref[lvl, 0]
    dense = dense_ref[lvl, 0]
    res1_i = (res_m1 + 2.0).astype(jnp.int32)

    pos = pos_ref[:]                          # (3, S, 128)
    base, frac = _kernel_coords(pos, res_m1)
    base3 = tuple(base[d] for d in range(3))
    frac3 = tuple(frac[d] for d in range(3))

    if n_corners:
        pltpu.prng_seed(seed_ref[0, 0], lvl * 65536 + tile)
        corners, weights = _stoch_corners(frac3, n_corners)
    else:
        corners = list(_CORNERS)
        weights = [_trilinear_w(frac3, c) for c in corners]

    rl_pairs = [_corner_index(base3, c, res1_i, dense, rows)
                for c in corners]

    s = pos.shape[1]
    acc0 = jnp.zeros((s, _LANES), jnp.float32)
    acc1 = jnp.zeros((s, _LANES), jnp.float32)

    def body(r, carry):
        a0, a1 = carry
        rowvals = jax.lax.broadcast_in_dim(
            tab_ref[0, pl.ds(r, 1), :], (s, _LANES), (0, 1))
        for (row, lane), w in zip(rl_pairs, weights):
            g = jnp.take_along_axis(rowvals, lane, axis=1)
            f0, f1 = _unpack(g)
            hit = (row == r).astype(jnp.float32) * w
            a0 = a0 + hit * f0
            a1 = a1 + hit * f1
        return a0, a1

    acc0, acc1 = jax.lax.fori_loop(0, rows, body, (acc0, acc1))
    out_ref[0, 0] = acc0
    out_ref[0, 1] = acc1


def _fwd_pallas(table, positions, config, seed, n_corners):
    levels = table.shape[0]
    res_arr, rows_arr, dense_arr, r_max = _scalar_args(config)
    packed = _pack_table(table)
    if packed.shape[1] < r_max:
        packed = jnp.pad(packed,
                         ((0, 0), (0, r_max - packed.shape[1]), (0, 0)))
    tile_n = _tile_n(positions.shape[0])
    pt, n, m = _prep_positions(positions, tile_n)
    s_tiles = tile_n // _LANES
    n_tiles = m // tile_n
    seed_arr = jnp.asarray([[0 if seed is None else seed]], jnp.int32) \
        if not isinstance(seed, jnp.ndarray) else seed.reshape(1, 1)
    kernel = functools.partial(_fwd_kernel, n_corners=n_corners,
                               s_tiles=s_tiles)
    out = pl.pallas_call(
        kernel,
        grid=(levels, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # res
            pl.BlockSpec(memory_space=pltpu.SMEM),   # rows
            pl.BlockSpec(memory_space=pltpu.SMEM),   # dense
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
            pl.BlockSpec((3, s_tiles, _LANES), lambda l, t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_max, _LANES), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, s_tiles, _LANES),
                               lambda l, t: (l, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((levels, 2, m // _LANES, _LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(res_arr, rows_arr, dense_arr,
      seed_arr.astype(jnp.int32), pt, packed)
    # (L, 2, M/128, 128) -> (N, L*2)
    out = out.reshape(levels * 2, m).T[:n]
    return out


# ---------------------------------------------------------------------------
# backward kernel: dtable = A_w^T M  per 128-lookup lane row
# ---------------------------------------------------------------------------

def _bwd_kernel(res_ref, rows_ref, dense_ref, seed_ref, pos_ref, g_ref,
                out_ref, *, n_corners: int, r_max: int):
    lvl = pl.program_id(0)
    tile = pl.program_id(1)

    @pl.when(tile == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    res_m1 = res_ref[lvl, 0]
    rows = rows_ref[lvl, 0]
    dense = dense_ref[lvl, 0]
    res1_i = (res_m1 + 2.0).astype(jnp.int32)

    pos = pos_ref[:]
    base, frac = _kernel_coords(pos, res_m1)
    base3 = tuple(base[d] for d in range(3))
    frac3 = tuple(frac[d] for d in range(3))

    if n_corners:
        pltpu.prng_seed(seed_ref[0, 0], lvl * 65536 + tile)
        corners, weights = _stoch_corners(frac3, n_corners)
    else:
        corners = list(_CORNERS)
        weights = [_trilinear_w(frac3, c) for c in corners]

    rl_pairs = [_corner_index(base3, c, res1_i, dense, rows)
                for c in corners]

    s = pos.shape[1]
    n_c = len(corners)
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)

    # Stage per-corner (row, lane, weight) through VMEM scratch so the
    # sublane loop can be a fori_loop with dynamic ref slices (value-level
    # dynamic_slice does not lower in Mosaic, and a static unroll of
    # tile_rows x corners blows up the compiler).
    def inner(row_s, lane_s, w_s):
        for c, ((row, lane), w) in enumerate(zip(rl_pairs, weights)):
            row_s[c] = row
            lane_s[c] = lane
            w_s[c] = w if w is not None else jnp.ones_like(pos[0])

        chunk = 8 if s % 8 == 0 else 1

        def srow(ci, carry):
            d0, d1 = carry
            base_i = ci * chunk
            for off in range(chunk):       # static sub-unroll amortizes
                si = base_i + off          # the fori_loop overhead
                g0 = g_ref[0, 0, pl.ds(si, 1), :]          # (1, 128)
                g1 = g_ref[0, 1, pl.ds(si, 1), :]
                for c in range(n_c):
                    row_v = row_s[c, pl.ds(si, 1), :]
                    lane_v = lane_s[c, pl.ds(si, 1), :]
                    wv = w_s[c, pl.ds(si, 1), :]
                    w0, w1 = g0 * wv, g1 * wv
                    arow = (iota_sub == jax.lax.broadcast_in_dim(
                        row_v, (_LANES, _LANES), (0, 1))).astype(jnp.float32)
                    mt = (iota_sub == jax.lax.broadcast_in_dim(
                        lane_v, (_LANES, _LANES), (0, 1))).astype(jnp.float32)
                    aw0 = arow * jax.lax.broadcast_in_dim(
                        w0, (_LANES, _LANES), (0, 1))
                    aw1 = arow * jax.lax.broadcast_in_dim(
                        w1, (_LANES, _LANES), (0, 1))
                    d0 = d0 + jax.lax.dot_general(
                        aw0, mt, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    d1 = d1 + jax.lax.dot_general(
                        aw1, mt, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
            return d0, d1

        d0, d1 = jax.lax.fori_loop(
            0, s // chunk, srow,
            (jnp.zeros((_LANES, _LANES), jnp.float32),
             jnp.zeros((_LANES, _LANES), jnp.float32)))
        out_ref[0, 0] += d0[:r_max]
        out_ref[0, 1] += d1[:r_max]

    pl.run_scoped(
        inner,
        row_s=pltpu.VMEM((n_c, s, _LANES), jnp.int32),
        lane_s=pltpu.VMEM((n_c, s, _LANES), jnp.int32),
        w_s=pltpu.VMEM((n_c, s, _LANES), jnp.float32))


def _bwd_pallas(table_shape, positions, g, config, seed, n_corners):
    levels = table_shape[0]
    res_arr, rows_arr, dense_arr, r_max = _scalar_args(config)
    if r_max > _LANES:
        raise ValueError(
            f'hash_encode_xbar backward: table extent {r_max * _LANES} '
            f'(log2_table_size={config.log2_table_size}) exceeds the '
            f'single-block one-hot limit of {_LANES * _LANES} entries; '
            f'use log2_table_size <= 14 or the sorted-stream encode')
    # IMPORTANT: must match the forward's tiling exactly — the stochastic
    # corner choice is replayed from the per-(level, tile) PRNG stream.
    tile_n = _tile_n(positions.shape[0])
    pt, n, m = _prep_positions(positions, tile_n)
    s_tiles = tile_n // _LANES
    n_tiles = m // tile_n
    # g: (N, L*2) -> (L, 2, M/128, 128)
    gt = jnp.pad(g, ((0, m - n), (0, 0))).T.reshape(
        levels, 2, m // _LANES, _LANES)
    seed_arr = jnp.asarray([[0 if seed is None else seed]], jnp.int32) \
        if not isinstance(seed, jnp.ndarray) else seed.reshape(1, 1)
    kernel = functools.partial(_bwd_kernel, n_corners=n_corners,
                               r_max=r_max)
    dtab = pl.pallas_call(
        kernel,
        grid=(levels, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, s_tiles, _LANES), lambda l, t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, s_tiles, _LANES), lambda l, t: (l, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, r_max, _LANES),
                               lambda l, t: (l, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((levels, 2, r_max, _LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(res_arr, rows_arr, dense_arr, seed_arr.astype(jnp.int32), pt, gt)
    full_r = table_shape[2]
    if full_r > r_max:
        dtab = jnp.pad(dtab, ((0, 0), (0, 0), (0, full_r - r_max), (0, 0)))
    else:
        dtab = dtab[:, :, :full_r]
    return dtab


# ---------------------------------------------------------------------------
# position-gradient kernel (dynamic methods: deformation fields need
# d(encode)/d(position); the plain encode returns zeros for speed)
# ---------------------------------------------------------------------------

def _bwd_pos_kernel(res_ref, rows_ref, dense_ref, seed_ref, pos_ref,
                    tab_ref, g_ref, dpos_ref, *, n_corners: int):
    # Grid is (n_tiles, levels) with levels INNERMOST: Pallas only guarantees
    # output-block accumulation across consecutive revisits of the same block,
    # and each dpos tile-block is revisited once per level — so the level
    # dimension must iterate fastest (advisor finding, round 2).
    tile = pl.program_id(0)
    lvl = pl.program_id(1)

    @pl.when(lvl == 0)
    def _():
        dpos_ref[...] = jnp.zeros_like(dpos_ref)

    res_m1 = res_ref[lvl, 0]
    rows = rows_ref[lvl, 0]
    dense = dense_ref[lvl, 0]
    res1_i = (res_m1 + 2.0).astype(jnp.int32)
    pos = pos_ref[:]
    base, frac = _kernel_coords(pos, res_m1)
    base3 = tuple(base[d] for d in range(3))
    frac3 = tuple(frac[d] for d in range(3))
    if n_corners:
        pltpu.prng_seed(seed_ref[0, 0], lvl * 65536 + tile)
    corners, weights, factors, dfactors = _corner_set(frac3, n_corners)
    rl_pairs = [_corner_index(base3, c, res1_i, dense, rows)
                for c in corners]
    s = pos.shape[1]
    nc = len(corners)

    # Gather per-corner packed values with the same S-loop as the forward.
    def body(r, vals):
        rowvals = jax.lax.broadcast_in_dim(
            tab_ref[0, pl.ds(r, 1), :], (s, _LANES), (0, 1))
        new = []
        for ci, (row, lane) in enumerate(rl_pairs):
            g = jnp.take_along_axis(rowvals, lane, axis=1)
            hit = (row == r)
            new.append(jnp.where(hit, g, vals[ci]))
        return tuple(new)

    vals = jax.lax.fori_loop(
        0, rows, body,
        tuple(jnp.zeros((s, _LANES), jnp.uint32) for _ in range(nc)))

    g0 = g_ref[0, 0]
    g1 = g_ref[0, 1]
    d0 = jnp.zeros((s, _LANES), jnp.float32)
    d1 = jnp.zeros((s, _LANES), jnp.float32)
    d2 = jnp.zeros((s, _LANES), jnp.float32)
    for ci in range(nc):
        f0, f1 = _unpack(vals[ci])
        gpair = g0 * f0 + g1 * f1
        fa, fb, fc = factors[ci]
        dfa, dfb, dfc = dfactors[ci]
        d0 = d0 + gpair * dfa * (fb * fc) * res_m1
        d1 = d1 + gpair * dfb * (fa * fc) * res_m1
        d2 = d2 + gpair * dfc * (fa * fb) * res_m1
    dpos_ref[0, 0] += d0
    dpos_ref[0, 1] += d1
    dpos_ref[0, 2] += d2


def _bwd_pos_pallas(table, positions, g, config, seed, n_corners):
    levels = table.shape[0]
    res_arr, rows_arr, dense_arr, r_max = _scalar_args(config)
    packed = _pack_table(table)
    if packed.shape[1] < r_max:
        packed = jnp.pad(packed,
                         ((0, 0), (0, r_max - packed.shape[1]), (0, 0)))
    tile_n = _tile_n(positions.shape[0])
    pt, n, m = _prep_positions(positions, tile_n)
    s_tiles = tile_n // _LANES
    n_tiles = m // tile_n
    gt = jnp.pad(g, ((0, m - n), (0, 0))).T.reshape(
        levels, 2, m // _LANES, _LANES)
    seed_arr = jnp.asarray([[0 if seed is None else seed]], jnp.int32) \
        if not isinstance(seed, jnp.ndarray) else seed.reshape(1, 1)
    kernel = functools.partial(_bwd_pos_kernel, n_corners=n_corners)
    dpos = pl.pallas_call(
        kernel,
        grid=(n_tiles, levels),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, s_tiles, _LANES), lambda t, l: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_max, _LANES), lambda t, l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, s_tiles, _LANES), lambda t, l: (l, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, s_tiles, _LANES),
                               lambda t, l: (0, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 3, m // _LANES, _LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(res_arr, rows_arr, dense_arr, seed_arr.astype(jnp.int32), pt,
      packed, gt)
    return dpos.reshape(3, m).T[:n]


def _dpos_jnp(table, positions, g, config):
    """Oracle/CPU position gradient of the exact encode via autodiff of a
    differentiable-gather formulation."""
    levels = table.shape[0]

    def encode(p):
        res_m1, rows, dense, _ = level_layout(config)
        res = jnp.asarray(res_m1, jnp.float32)
        scaled = p[None] * res[:, None, None]
        floor = jax.lax.stop_gradient(jnp.floor(scaled))
        frac = scaled - floor
        base = floor.astype(jnp.int32)
        corners = jnp.asarray(_CORNERS, jnp.int32)
        cc = base[:, :, None, :] + corners[None, None]
        cf = corners.astype(jnp.float32)
        w = jnp.prod(jnp.where(cf[None, None] > 0, frac[:, :, None, :],
                               1.0 - frac[:, :, None, :]), axis=-1)
        res1 = (res + 2.0).astype(jnp.int32)[:, None, None]
        lin = cc[..., 0] + cc[..., 1] * res1 + cc[..., 2] * res1 * res1
        u = cc.astype(jnp.uint32)
        h = (u[..., 0] ^ (u[..., 1] * _P1) ^
             (u[..., 2] * _P2)).astype(jnp.int32)
        rows_a = jnp.asarray(rows, jnp.int32)[:, None, None]
        h = jnp.bitwise_and(h, rows_a * _LANES - 1)
        dense_a = jnp.asarray(dense, jnp.int32)[:, None, None]
        idx = jnp.where(dense_a != 0, lin, h)
        flat = table.reshape(levels, 2, -1)
        flat = flat.astype(jnp.bfloat16).astype(jnp.float32)
        gathered = jax.vmap(lambda tab, ind: tab[:, ind.reshape(-1)])(
            flat, idx)
        g4 = gathered.reshape(levels, 2, p.shape[0], 8)
        out = jnp.einsum('lfnc,lnc->nlf', g4, w)
        return out.reshape(p.shape[0], levels * 2)

    return jax.vjp(encode, positions)[1](g)[0]


# ---------------------------------------------------------------------------
# jnp reference / CPU fallback (identical semantics, exact mode)
# ---------------------------------------------------------------------------

def _level_indices_jnp(positions, config, corners_per_level=None):
    """Exact per-level corner indices/weights with dense-level linear
    indexing. Returns idx (L, N, 8) int32 and weights (L, N, 8)."""
    res_m1, rows, dense, r_max = level_layout(config)
    res = jnp.asarray(res_m1, jnp.float32)
    scaled = positions[None] * res[:, None, None]
    floor = jnp.floor(scaled)
    frac = scaled - floor
    base = floor.astype(jnp.int32)
    corners = jnp.asarray(_CORNERS, jnp.int32)
    cc = base[:, :, None, :] + corners[None, None]         # (L, N, 8, 3)
    cf = corners.astype(jnp.float32)
    weights = jnp.prod(
        jnp.where(cf[None, None] > 0, frac[:, :, None, :],
                  1.0 - frac[:, :, None, :]), axis=-1)
    res1 = (res + 2.0).astype(jnp.int32)[:, None, None]
    lin = cc[..., 0] + cc[..., 1] * res1 + cc[..., 2] * res1 * res1
    u = cc.astype(jnp.uint32)
    h = (u[..., 0] ^ (u[..., 1] * _P1) ^ (u[..., 2] * _P2)).astype(jnp.int32)
    rows_a = jnp.asarray(rows, jnp.int32)[:, None, None]
    h = jnp.bitwise_and(h, rows_a * _LANES - 1)
    dense_a = jnp.asarray(dense, jnp.int32)[:, None, None]
    return jnp.where(dense_a != 0, lin, h), weights


def _fwd_jnp(table, positions, config):
    levels = table.shape[0]
    n = positions.shape[0]
    idx, w = _level_indices_jnp(positions, config)
    flat = table.reshape(levels, 2, -1)                    # (L,2,R*128)
    gathered = jax.vmap(lambda tab, ind: tab[:, ind.reshape(-1)])(flat, idx)
    g4 = gathered.reshape(levels, 2, n, 8)
    # emulate the kernel's bf16 table read
    g4 = g4.astype(jnp.bfloat16).astype(jnp.float32)
    out = jnp.einsum('lfnc,lnc->nlf', g4, w)
    return out.reshape(n, levels * 2)


def _bwd_jnp(table_shape, positions, g, config):
    levels, _, rows_full, lanes = table_shape
    n = positions.shape[0]
    idx, w = _level_indices_jnp(positions, config)
    g3 = g.reshape(n, levels, 2)
    gl = jnp.einsum('nlf,lnc->lfnc', g3, w).reshape(levels, 2, n * 8)

    def per_level(ind, grad):
        flat_ind = ind.reshape(-1)

        def per_feature(gf):
            return jnp.zeros((rows_full * lanes,), gf.dtype
                             ).at[flat_ind].add(gf)
        return jax.vmap(per_feature)(grad)

    return jax.vmap(per_level)(idx, gl).reshape(table_shape)


# ---------------------------------------------------------------------------
# public differentiable entry points
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode_xbar(table: jnp.ndarray, positions: jnp.ndarray,
                     config: HashGridConfig) -> jnp.ndarray:
    """Exact 8-corner crossbar encode.

    table (L, 2, R, 128) f32, positions (N, 3) in [0,1) -> (N, L*2).
    Gradients flow to the table only.
    """
    if jax.default_backend() == 'tpu':
        return _fwd_pallas(table, positions, config, None, 0)
    return _fwd_jnp(table, positions, config)


def _hx_fwd(table, positions, config):
    return hash_encode_xbar(table, positions, config), \
        (positions, table.shape)


def _hx_bwd(config, res, g):
    positions, table_shape = res
    if jax.default_backend() == 'tpu':
        dtab = _bwd_pallas(table_shape, positions, g, config, None, 0)
    else:
        dtab = _bwd_jnp(table_shape, positions, g, config)
    return dtab, jnp.zeros_like(positions)


hash_encode_xbar.defvjp(_hx_fwd, _hx_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def hash_encode_xbar_stochastic(table: jnp.ndarray, positions: jnp.ndarray,
                                seed: jnp.ndarray,
                                config: HashGridConfig,
                                n_corners: int = 2) -> jnp.ndarray:
    """Stochastic single-corner encode (training fast path).

    The corner of each (sample, level) cell is sampled with probability
    equal to its trilinear weight, making this an unbiased estimator of
    the exact encode; ``seed`` (int32 scalar array) must vary per step.
    On non-TPU backends this falls back to the exact encode (the kernel
    PRNG is TPU-only).
    """
    if jax.default_backend() == 'tpu':
        return _fwd_pallas(table, positions, config, seed, n_corners)
    return _fwd_jnp(table, positions, config)


def _hxs_fwd(table, positions, seed, config, n_corners=2):
    return hash_encode_xbar_stochastic(table, positions, seed, config,
                                       n_corners), \
        (positions, seed, table.shape)


def _hxs_bwd(config, n_corners, res, g):
    positions, seed, table_shape = res
    if jax.default_backend() == 'tpu':
        dtab = _bwd_pallas(table_shape, positions, g, config, seed,
                           n_corners)
    else:
        dtab = _bwd_jnp(table_shape, positions, g, config)
    seed_ct = np.zeros(np.shape(seed), jax.dtypes.float0)
    return dtab, jnp.zeros_like(positions), seed_ct


hash_encode_xbar_stochastic.defvjp(_hxs_fwd, _hxs_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode_xbar_posgrad(table: jnp.ndarray, positions: jnp.ndarray,
                             config: HashGridConfig) -> jnp.ndarray:
    """Exact 8-corner encode WITH position gradients (for deformation
    fields — methods/dnerf). Slower backward: the dpos kernel re-gathers
    the corner values."""
    if jax.default_backend() == 'tpu':
        return _fwd_pallas(table, positions, config, None, 0)
    return _fwd_jnp(table, positions, config)


def _hxp_fwd(table, positions, config):
    return hash_encode_xbar_posgrad(table, positions, config), \
        (table, positions)


def _hxp_bwd(config, res, g):
    table, positions = res
    if jax.default_backend() == 'tpu':
        dtab = _bwd_pallas(table.shape, positions, g, config, None, 0)
        dpos = _bwd_pos_pallas(table, positions, g, config, None, 0)
    else:
        dtab = _bwd_jnp(table.shape, positions, g, config)
        dpos = _dpos_jnp(table, positions, g, config)
    return dtab, dpos


hash_encode_xbar_posgrad.defvjp(_hxp_fwd, _hxp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def hash_encode_xbar_stochastic_posgrad(
        table: jnp.ndarray, positions: jnp.ndarray, seed: jnp.ndarray,
        config: HashGridConfig, n_corners: int = 2) -> jnp.ndarray:
    """Stochastic encode WITH (pathwise/straight-through) position
    gradients: exact for the interpolated dims of each sampled corner,
    zero for the Bernoulli-sampled dims (their probability-gradient term
    is dropped). Good enough to train deformation fields; use
    n_corners=0 via hash_encode_xbar_posgrad for exact gradients."""
    if jax.default_backend() == 'tpu':
        return _fwd_pallas(table, positions, config, seed, n_corners)
    return _fwd_jnp(table, positions, config)


def _hxsp_fwd(table, positions, seed, config, n_corners=2):
    return hash_encode_xbar_stochastic_posgrad(
        table, positions, seed, config, n_corners), \
        (table, positions, seed)


def _hxsp_bwd(config, n_corners, res, g):
    table, positions, seed = res
    if jax.default_backend() == 'tpu':
        dtab = _bwd_pallas(table.shape, positions, g, config, seed,
                           n_corners)
        dpos = _bwd_pos_pallas(table, positions, g, config, seed, n_corners)
    else:
        dtab = _bwd_jnp(table.shape, positions, g, config)
        dpos = _dpos_jnp(table, positions, g, config)
    seed_ct = np.zeros(np.shape(seed), jax.dtypes.float0)
    return dtab, dpos, seed_ct


hash_encode_xbar_stochastic_posgrad.defvjp(_hxsp_fwd, _hxsp_bwd)
