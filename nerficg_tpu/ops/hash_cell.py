"""Cell-packed windowed hash encode (generation 4).

Reference equivalent: tiny-cuda-nn's HashGrid encoding
(src/Thirdparty/TinyCudaNN.py; configured in
src/Methods/InstantNGP/Model.py:58-81, 16 levels x 2 features, 2^19 table).

Why a fourth generation (measured cost model in PERF_NOTES.md): the gen-3
windowed encode (ops/hash_window.py) still pays PER CORNER — every sample
computes 8 hash/brick/window addresses and the scan latches 8 independent
(row, lane) streams, so exact-8 interpolation costs ~8x the per-corner
machinery and the default had to fall back to stochastic corner sampling
(quality bill: -0.22 dB at 4 corners).  Windows also widen with capacity
(rows-per-brick ~ table extent), making 2^19 tables 3-5x slower.

Gen-4 changes the TABLE LAYOUT instead of the estimator:

  * **One address per cell.**  The hashed unit is the CELL (its base
    vertex), not the 8 corner vertices.  All 8 corner features of a cell
    live at table rows ``base_row*8 + c`` and ONE lane, so a sample
    computes a single hash + brick-morton + window address, and the scan
    loop latches all 8 corners from one (8, 128) row block per iteration
    (1 compare + 8 gather/selects, vs 8 compares + 8 gathers + 8 selects
    over ~3x more iterations in gen-3).
  * **Flat capacity scaling.**  Addressable units shrink 8x (cells =
    entries/8), so base rows = table_size/1024 and the per-brick row count
    stays tiny even at the reference's 2^19 (base rows 512, rows-per-brick
    1 at b=3) — the window width is set by the sample stream's spatial
    extent, not the table extent.  Measured: 2^14 -> 2^19 costs ~1x (gen-3:
    ~5x extrapolated).
  * **Exact 8-corner interpolation always.**  With the per-corner machinery
    amortized, exact-8 costs less than gen-3's stochastic-4, so the
    stochastic quality bill disappears.

The price is the parameterization: corner features are per-cell, NOT shared
with neighboring cells, so the interpolated field is discontinuous across
cell faces of hash levels (like a collision), and two cells colliding in
the hash share all 8 corners coherently.  Information capacity (independent
feature entries) is unchanged.  Coarse levels store cells densely
(collision-free) while their 8x-duplicated footprint fits _DENSE_CELL_MAX.
Measure quality with tools/capacity_ab.py before changing defaults.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerficg_tpu.ops.hashgrid import HashGridConfig
from nerficg_tpu.ops.hash_window import (_pack_table, _unpack, _wrap_rel,
                                         _spread_tables,
                                         _pad_positions, morton_keys_xyz,
                                         WIN_TILE_N)

__all__ = ['CellLayout', 'cell_layout', 'cell_window_bases',
           'hash_encode_cell', 'CELL_SUB_BLOCK']

# Sub-block granularity of the scan windows.  Smaller sub-blocks see
# tighter morton ranges (the stream's gaps dominate the window width), and
# measured total scan work ~halves per halving down to ~16; below that the
# (ssb, 128) VPU shapes lose efficiency.  16 is the sweet spot (gen-3 used
# 64 — acceptable there because its windows were rpb-dominated).
CELL_SUB_BLOCK = 16

_LANES = 128
_P1 = np.uint32(2654435761)
_P2 = np.uint32(805459861)
_CORNERS = tuple((i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1))
_BRICK_BITS_MAX = 5
# A coarse level stores its cells densely (collision-free, linear index)
# while 8 * (res-1)^3 entries fit this budget; the 8x duplication vs a
# vertex table is paid in HBM (cheap), not in scan cost.
_DENSE_CELL_MAX = 1 << 18
# Out-of-window straggler budget (fraction of samples whose quantized cell
# straddles a brick boundary; they wrap into the window as one extra hash
# collision).  Same budget as gen-3 (ops/hash_window.py _DIV_MAX).
_DIV_MAX = 0.105
# Table shrink divisor for full-scan mid levels (scan cost ~ rows).
_MID_LOAD = 8


def _pow2_floor(x: int) -> int:
    return 1 << max(int(math.floor(math.log2(max(x, 1)))), 0)


class CellLayout(NamedTuple):
    """Static per-level layout (python tuples -> hashable/jit-stable).

    Rows are counted in BASE rows (one per cell slot row of 128 lanes);
    a level occupies ``base_rows * 8`` actual 128-lane table rows
    (row = base_row * 8 + corner)."""
    res: tuple            # level resolution (vertex grid side)
    base_rows: tuple      # cell-slot rows (128 slots each)
    dense: tuple          # 1 = dense linear cell indexing, 0 = hashed
    bscale: tuple         # 2^b / (res-1): brick_d = floor(cell_d * bscale)
    rpb: tuple            # base rows per brick (when bricks >= rows: 1)
    rsh: tuple            # brick-morton right shift (when bricks > rows):
                          # row = (bm >> rsh) * rpb + hash_bits — monotone
                          # in bm, so brick granularity is capacity-free
    r_pad: int            # padded table rows (multiple of 128, +128 margin)


@functools.lru_cache(maxsize=None)
def cell_layout(config: HashGridConfig) -> CellLayout:
    cap = config.table_size
    assert cap % 1024 == 0, 'cell layout needs table_size % 1024 == 0'
    res_l, brows_l, dense_l, bscale_l, rpb_l, rsh_l = [], [], [], [], [], []
    for r in config.level_resolutions():
        cells = (r - 1) ** 3 if r < 4096 else _DENSE_CELL_MAX
        # Dense storage must fit both the global budget and the level's own
        # table slice (R = cap/128 rows per level): 8*cells entries <= cap.
        if cells * 8 <= min(_DENSE_CELL_MAX, cap):
            brows = (cells + _LANES - 1) // _LANES
            res_l.append(r); brows_l.append(brows); dense_l.append(1)
            bscale_l.append(0.0); rpb_l.append(0); rsh_l.append(0)
        else:
            brows = cap // 1024
            brow_bits = int(math.log2(brows)) if brows > 1 else 0
            # Brick granularity under the out-of-window budget: a sample
            # whose quantized cell straddles a brick boundary can fall
            # outside the tight morton-range window and wraps into it as
            # one extra hash collision (gen-3 design, _DIV_MAX=0.105
            # budget: 3 * 2^b / side <= 0.105).  When the brick count
            # exceeds the row count, the brick morton is right-shifted
            # onto rows — a monotone map, so windows follow the stream's
            # spatial extent, not the table's.
            side = r - 1
            b = max(min(_BRICK_BITS_MAX,
                        int(math.floor(math.log2(max(
                            _DIV_MAX * side / 3.0, 1.0))))), 0)
            if b == 0:
                # Mid level: no locality possible within the budget — a
                # full-scan hash level with a SHRUNKEN table (its cell
                # count is modest, and full scans pay per row).
                slots = min(cap // 8,
                            max(1 << 12, _pow2_floor(cells // _MID_LOAD)))
                brows = slots // _LANES
            rsh = max(3 * b - brow_bits, 0) if b else 0
            rpb = max(brows >> (3 * b), 1) if b else brows
            res_l.append(r); brows_l.append(brows); dense_l.append(0)
            bscale_l.append((1 << b) / side)
            rpb_l.append(rpb); rsh_l.append(rsh)
    r_max = max(br * 8 for br in brows_l)
    r_pad = -(-r_max // _LANES) * _LANES + _LANES
    return CellLayout(tuple(res_l), tuple(brows_l), tuple(dense_l),
                      tuple(bscale_l), tuple(rpb_l), tuple(rsh_l), r_pad)


# ---------------------------------------------------------------------------
# index math — single source of truth for oracle, window precompute, kernel
# ---------------------------------------------------------------------------

def _morton3_static(x, y, z):
    m = jnp.zeros_like(x)
    for i in range(_BRICK_BITS_MAX):
        m = m | (((x >> i) & 1) << (3 * i + 2))
        m = m | (((y >> i) & 1) << (3 * i + 1))
        m = m | (((z >> i) & 1) << (3 * i))
    return m


def _deinterleave3(m, bits):
    """3D morton code -> (x, y, z) components (x at bit 3i+2)."""
    x = jnp.zeros_like(m)
    y = jnp.zeros_like(m)
    z = jnp.zeros_like(m)
    for i in range(bits):
        x = x | (((m >> (3 * i + 2)) & 1) << i)
        y = y | (((m >> (3 * i + 1)) & 1) << i)
        z = z | (((m >> (3 * i)) & 1) << i)
    return x, y, z


def _interleave3(x, y, z, bits):
    m = jnp.zeros_like(x)
    for i in range(bits):
        m = m | (((x >> i) & 1) << (3 * i + 2))
        m = m | (((y >> i) & 1) << (3 * i + 1))
        m = m | (((z >> i) & 1) << (3 * i))
    return m


def _cell_base_row_lane(vx, vy, vz, res, dense, bscale, rpb, rsh, sp=None):
    """Cell base-vertex coords -> (base_row, lane); scalars per level.

    Shared by the jnp oracle (sp=None: shift/or morton) and the kernel
    (sp=_spread_tables LUT) — identical mapping."""
    side = res - 1
    lin = (vx * side + vy) * side + vz
    row_d = jnp.right_shift(lin, 7)
    lane_d = jnp.bitwise_and(lin, _LANES - 1)
    bx = (vx.astype(jnp.float32) * bscale).astype(jnp.int32)
    by = (vy.astype(jnp.float32) * bscale).astype(jnp.int32)
    bz = (vz.astype(jnp.float32) * bscale).astype(jnp.int32)
    if sp is not None:
        bm = (jnp.take_along_axis(sp[0], bx, axis=1) |
              jnp.take_along_axis(sp[1], by, axis=1) |
              jnp.take_along_axis(sp[2], bz, axis=1))
        h = vx ^ (vy * jnp.int32(_P1.astype(np.int32))) ^ \
            (vz * jnp.int32(_P2.astype(np.int32)))
    else:
        bm = _morton3_static(bx, by, bz)
        h = (vx.astype(jnp.uint32) ^ (vy.astype(jnp.uint32) * _P1) ^
             (vz.astype(jnp.uint32) * _P2)).astype(jnp.int32)
    row_h = jnp.right_shift(bm, rsh) * rpb + \
        jnp.bitwise_and(jnp.right_shift(h, 7), rpb - 1)
    lane_h = jnp.bitwise_and(h, _LANES - 1)
    is_dense = dense != 0
    return (jnp.where(is_dense, row_d, row_h),
            jnp.where(is_dense, lane_d, lane_h))


def cell_window_bases(positions: jnp.ndarray, config: HashGridConfig,
                      sub_block: int = CELL_SUB_BLOCK,
                      anchor_keys: Optional[jnp.ndarray] = None
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per (level, sub-block) BASE-row scan windows for a morton-sorted
    sample batch (windows are in base rows — the kernel scans ``win``
    (8, 128) row blocks per sub-block).

    Hash levels use TIGHT morton-range windows over the sub-block's anchor
    keys with a +-1-brick margin (sub-blocks are contiguous in the sorted
    key order, so the range is narrow by construction); samples whose
    quantized cell still falls outside (componentwise brick straddles,
    block spread past the sub-block edge — bounded by the _DIV_MAX budget)
    wrap into the window as one extra hash collision.  A componentwise-
    exact cover was measured ~5x wider (box-corner mortons escape the
    sorted segment), a worse trade than the bounded collision noise.
    Dense levels are exact (linear index is monotone in the positions)."""
    lay = cell_layout(config)
    n = positions.shape[0]
    sb_n = sub_block * _LANES
    assert n % sb_n == 0, 'positions must be padded to the sub-block size'
    nsb = n // sb_n
    stride = max(int(getattr(config, 'anchor_stride', 1)), 1)
    if anchor_keys is not None and anchor_keys.shape[0] % nsb == 0:
        anchors = anchor_keys.reshape(nsb, -1)
    else:
        keys = morton_keys_xyz(positions[..., 0], positions[..., 1],
                               positions[..., 2])
        if stride > 1 and sb_n % stride == 0:
            anchors = keys.reshape(nsb, sb_n // stride, stride)[:, :, 0]
        else:
            anchors = keys.reshape(nsb, sb_n)
    kmin = anchors.min(axis=1)
    kmax = anchors.max(axis=1)
    lo_l, win_l = [], []
    for lv in range(len(lay.res)):
        brows = lay.base_rows[lv]
        res = lay.res[lv]
        side = res - 1
        if lay.dense[lv]:
            v = jnp.clip((positions * side).astype(jnp.int32), 0, side - 1)
            lin = (v[:, 0] * side + v[:, 1]) * side + v[:, 2]
            rb = jnp.right_shift(lin, 7).reshape(nsb, sb_n)
            lo = rb.min(axis=1)
            hi = rb.max(axis=1)
        else:
            rpb = lay.rpb[lv]
            rsh = lay.rsh[lv]
            b = round(math.log2(max(lay.bscale[lv] * side, 1.0)))
            shift = 3 * (10 - b)
            lo = jnp.right_shift(
                jnp.right_shift(kmin, shift) - 1, rsh) * rpb
            hi = (jnp.right_shift(
                jnp.right_shift(kmax, shift) + 2, rsh) + 1) * rpb - 1
        lo = jnp.maximum(lo, 0)
        hi_c = jnp.minimum(hi, brows - 1)
        win = hi_c - lo + 1
        lo_l.append(lo)
        win_l.append(win)
    return jnp.stack(lo_l), jnp.stack(win_l)


# ---------------------------------------------------------------------------
# jnp oracle / CPU fallback (window wrap included)
# ---------------------------------------------------------------------------

def _cell_rows_lanes_w_jnp(positions, config):
    """(L, N) base rows/lanes + (L, N, 8) trilinear weights."""
    lay = cell_layout(config)
    rows_o, lanes_o, w_o = [], [], []
    corners = jnp.asarray(_CORNERS, jnp.int32)
    cf = corners.astype(jnp.float32)
    for lv in range(len(lay.res)):
        res = lay.res[lv]
        scaled = positions * (res - 1)
        floor = jnp.floor(scaled)
        frac = scaled - floor
        base = floor.astype(jnp.int32)
        w = jnp.prod(jnp.where(cf[None] > 0, frac[:, None, :],
                               1.0 - frac[:, None, :]), axis=-1)
        row, lane = _cell_base_row_lane(
            base[:, 0], base[:, 1], base[:, 2], res, lay.dense[lv],
            lay.bscale[lv], max(lay.rpb[lv], 1), lay.rsh[lv])
        rows_o.append(row); lanes_o.append(lane); w_o.append(w)
    return jnp.stack(rows_o), jnp.stack(lanes_o), jnp.stack(w_o)


def _apply_window_jnp(base_rows, lo, win, sub_block):
    levels, n = base_rows.shape
    sb_n = sub_block * _LANES
    sb_of = jnp.arange(n) // sb_n
    lo_s = lo[:, sb_of]
    win_s = win[:, sb_of]
    rel = _wrap_rel(base_rows - lo_s, win_s)
    return lo_s + rel


def _fwd_jnp(table, positions, config, lo, win, sub_block=CELL_SUB_BLOCK):
    """Oracle forward. table (L, 2, R, 128) f32 with R = table_size/128
    viewed as (base_row, corner) = (R/8, 8); returns feature-major
    (L*2, N)."""
    levels = table.shape[0]
    n = positions.shape[0]
    base_rows, lanes, w = _cell_rows_lanes_w_jnp(positions, config)
    base_rows = _apply_window_jnp(base_rows, lo, win, sub_block)
    # idx per corner c: (base_row*8 + c) * 128 + lane
    idx = ((base_rows * 8)[:, :, None] +
           jnp.arange(8, dtype=jnp.int32)[None, None, :]) * _LANES + \
        lanes[:, :, None]                                   # (L, N, 8)
    flat = table.reshape(levels, 2, -1)
    flat = flat.astype(jnp.bfloat16).astype(jnp.float32)    # kernel reads bf16
    gathered = jax.vmap(lambda tab, ind: tab[:, ind.reshape(-1)])(flat, idx)
    g4 = gathered.reshape(levels, 2, n, 8)
    out = jnp.einsum('lfnc,lnc->lfn', g4, w)
    return out.reshape(levels * 2, n)


def _bwd_jnp(table_shape, positions, g, config, lo, win,
             sub_block=CELL_SUB_BLOCK):
    levels, _, rows_full, lanes_n = table_shape
    n = positions.shape[0]
    base_rows, lanes, w = _cell_rows_lanes_w_jnp(positions, config)
    base_rows = _apply_window_jnp(base_rows, lo, win, sub_block)
    idx = ((base_rows * 8)[:, :, None] +
           jnp.arange(8, dtype=jnp.int32)[None, None, :]) * _LANES + \
        lanes[:, :, None]
    g3 = g.reshape(levels, 2, n)
    gl = jnp.einsum('lfn,lnc->lfnc', g3, w).reshape(levels, 2, n * 8)

    def per_level(ind, grad):
        flat_ind = ind.reshape(-1)

        def per_feature(gf):
            return jnp.zeros((rows_full * lanes_n,), gf.dtype
                             ).at[flat_ind].add(gf)
        return jax.vmap(per_feature)(grad)

    return jax.vmap(per_level)(idx, gl).reshape(table_shape)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _addr_and_weights(pos, res_i, dense, bscale, rpb, rsh, sp):
    """pos (3, S, 128) -> (base_row, lane) int32 (S, 128) + 8 weights."""
    res_m1 = (res_i - 1).astype(jnp.float32)
    scaled = tuple(pos[d] * res_m1 for d in range(3))
    floor = tuple(jnp.floor(s) for s in scaled)
    frac = tuple(s - f for s, f in zip(scaled, floor))
    v = tuple(f.astype(jnp.int32) for f in floor)
    row, lane = _cell_base_row_lane(v[0], v[1], v[2], res_i, dense, bscale,
                                    rpb, rsh, sp)
    fx, fy, fz = frac
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    # weights in corner order (i, j, k) of _CORNERS
    weights = [gx * gy * gz, gx * gy * fz, gx * fy * gz, gx * fy * fz,
               fx * gy * gz, fx * gy * fz, fx * fy * gz, fx * fy * fz]
    return row, lane, weights


def _fwd_kernel(res_ref, dense_ref, bscale_ref, rpb_ref, rsh_ref, lo_ref,
                win_ref, pos_ref, tab_ref, out_ref, *, ssb: int,
                nsb_tile: int):
    lvl = pl.program_id(0)
    tile = pl.program_id(1)
    res_i = res_ref[lvl, 0]
    dense = dense_ref[lvl, 0]
    bscale = bscale_ref[lvl, 0]
    rpb = rpb_ref[lvl, 0]
    rsh = rsh_ref[lvl, 0]
    sp = _spread_tables(ssb)

    def sb_body(sb, _):
        off = pl.multiple_of(sb * ssb, ssb)
        pos = pos_ref[:, pl.ds(off, ssb), :]
        row, lane, weights = _addr_and_weights(pos, res_i, dense, bscale,
                                               rpb, rsh, sp)
        lo = lo_ref[lvl, tile * nsb_tile + sb]
        win = win_ref[lvl, tile * nsb_tile + sb]
        rel = _wrap_rel(row - lo, win)

        # Latch-then-unpack scan over (8*K, 128) row SUPER-BLOCKS: all 8
        # corners of a sample share one (base_row, lane), so each K-row
        # round pays K compares and 8K gather/selects from one
        # dynamically-loaded block.  K rows per fori iteration amortize
        # the ~0.5us per-iteration overhead of dynamic-trip loops
        # (measured round 4: 1-row iterations were overhead-bound).
        K = 8
        trip = (win + K - 1) // K

        def body(i, latched, rel=rel, lane=lane, lo=lo):
            blk = tab_ref[0, pl.ds(pl.multiple_of((lo + i * K) * 8, 8),
                                   8 * K), :]
            blk_i = pltpu.bitcast(blk, jnp.int32)
            out = list(latched)
            for k in range(K):
                hit = rel == i * K + k
                for c in range(8):
                    rv = jax.lax.broadcast_in_dim(
                        blk_i[k * 8 + c:k * 8 + c + 1, :], (ssb, _LANES),
                        (0, 1))
                    out[c] = jnp.where(
                        hit, jnp.take_along_axis(rv, lane, axis=1), out[c])
            return tuple(out)

        latched = jax.lax.fori_loop(
            0, trip, body,
            tuple(jnp.zeros((ssb, _LANES), jnp.int32) for _ in range(8)))
        acc0 = jnp.zeros((ssb, _LANES), jnp.float32)
        acc1 = jnp.zeros((ssb, _LANES), jnp.float32)
        for l_c, w in zip(latched, weights):
            f0, f1 = _unpack(pltpu.bitcast(l_c, jnp.uint32))
            acc0 = acc0 + w * f0
            acc1 = acc1 + w * f1
        out_ref[0, 0, pl.ds(off, ssb), :] = acc0
        out_ref[0, 1, pl.ds(off, ssb), :] = acc1
        return 0

    jax.lax.fori_loop(0, nsb_tile, sb_body, 0)


def _bwd_kernel(res_ref, dense_ref, bscale_ref, rpb_ref, rsh_ref, lo_ref,
                win_ref, pos_ref, g_ref, out_ref, *, ssb: int,
                nsb_tile: int):
    """Scatter-add via MXU one-hot dots, one dot per sample sub-row covering
    all 8 corners x 2 features (the corner axis rides the one-hot's row
    interleave: output row = (base_row*8 + c))."""
    lvl = pl.program_id(0)
    tile = pl.program_id(1)

    @pl.when(tile == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    res_i = res_ref[lvl, 0]
    dense = dense_ref[lvl, 0]
    bscale = bscale_ref[lvl, 0]
    rpb = rpb_ref[lvl, 0]
    rsh = rsh_ref[lvl, 0]
    sp = _spread_tables(ssb)
    _CHKB = 8                      # base rows per chunk (= 64 table rows)
    # iota over the chunk's interleaved rows r = rb*8 + c
    iota_rb = jax.lax.broadcasted_iota(
        jnp.int32, (_CHKB * 8, _LANES), 0) >> 3
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)

    def inner(rl_s, gw_s):
        def sb_body(sb, _):
            off = pl.multiple_of(sb * ssb, ssb)
            pos = pos_ref[:, pl.ds(off, ssb), :]
            row, lane, weights = _addr_and_weights(pos, res_i, dense,
                                                   bscale, rpb, rsh, sp)
            lo = lo_ref[lvl, tile * nsb_tile + sb]
            win = win_ref[lvl, tile * nsb_tile + sb]
            rel = _wrap_rel(row - lo, win)
            nwin = (win + _CHKB - 1) // _CHKB
            rl_s[...] = (rel << 7) | lane
            # Per-(feature, corner) gradient pre-products in INTERLEAVED
            # row order (si*8 + c): the per-sample-row A block is then one
            # contiguous (8, 128) load + a tiling broadcast + one multiply.
            g0 = g_ref[0, 0, pl.ds(off, ssb), :]
            g1 = g_ref[0, 1, pl.ds(off, ssb), :]
            gw_s[0] = jnp.stack([g0 * w for w in weights],
                                axis=1).reshape(ssb * 8, _LANES)
            gw_s[1] = jnp.stack([g1 * w for w in weights],
                                axis=1).reshape(ssb * 8, _LANES)

            def win_chunk(wi, _):
                # G sample-rows per fori iteration, statically unrolled:
                # ONE aligned dynamic load each for the (rel|lane) and
                # gradient-product streams, then static slices — dynamic
                # single-sublane loads and 1-dot iterations were measured
                # overhead-bound (~3.4us/iteration, round 4).
                G = 8

                def srow(gi, d):
                    rl_g = rl_s[pl.ds(pl.multiple_of(gi * G, G), G), :]
                    gw_g0 = gw_s[0, pl.ds(pl.multiple_of(gi * G * 8, 8),
                                          G * 8), :]
                    gw_g1 = gw_s[1, pl.ds(pl.multiple_of(gi * G * 8, 8),
                                          G * 8), :]
                    for g in range(G):
                        x = rl_g[g:g + 1, :]
                        rel_v = jnp.right_shift(x, 7) - wi * _CHKB
                        lane_v = jnp.bitwise_and(x, _LANES - 1)
                        # rhit8[(rb*8+c), s] = [rel == rb] (interleaved)
                        rhit8 = (iota_rb == jax.lax.broadcast_in_dim(
                            rel_v, (_CHKB * 8, _LANES), (0, 1))
                                 ).astype(jnp.float32)
                        a_blocks = []
                        for gw_g in (gw_g0, gw_g1):
                            gw8 = gw_g[g * 8:(g + 1) * 8, :]   # (8, 128)
                            tiled = jax.lax.broadcast_in_dim(
                                gw8, (_CHKB, 8, _LANES), (1, 2)
                            ).reshape(_CHKB * 8, _LANES)
                            a_blocks.append(rhit8 * tiled)
                        a_f = jnp.concatenate(a_blocks, axis=0
                                              ).astype(jnp.bfloat16)
                        m = (iota_lane == jax.lax.broadcast_in_dim(
                            lane_v, (_LANES, _LANES), (0, 1))
                             ).astype(jnp.bfloat16)
                        d = d + jax.lax.dot_general(
                            a_f, m, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    return d

                d = jax.lax.fori_loop(
                    0, ssb // G, srow,
                    jnp.zeros((2 * _CHKB * 8, _LANES), jnp.float32))
                # d rows already interleaved (f, rb*8 + c): direct writes.
                base_row = pl.multiple_of((lo + wi * _CHKB) * 8, 8)
                out_ref[0, 0, pl.ds(base_row, _CHKB * 8), :] += \
                    d[:_CHKB * 8]
                out_ref[0, 1, pl.ds(base_row, _CHKB * 8), :] += \
                    d[_CHKB * 8:]
                return 0

            jax.lax.fori_loop(0, nwin, win_chunk, 0)
            return 0

        jax.lax.fori_loop(0, nsb_tile, sb_body, 0)

    pl.run_scoped(
        inner,
        rl_s=pltpu.VMEM((ssb, _LANES), jnp.int32),
        gw_s=pltpu.VMEM((2, ssb * 8, _LANES), jnp.float32))


def _layout_args(config):
    lay = cell_layout(config)
    res = jnp.asarray(lay.res, jnp.int32).reshape(-1, 1)
    dense = jnp.asarray(lay.dense, jnp.int32).reshape(-1, 1)
    bscale = jnp.asarray(lay.bscale, jnp.float32).reshape(-1, 1)
    rpb = jnp.asarray([max(r, 1) for r in lay.rpb], jnp.int32).reshape(-1, 1)
    rsh = jnp.asarray(lay.rsh, jnp.int32).reshape(-1, 1)
    return lay, res, dense, bscale, rpb, rsh


def _fwd_pallas(table, positions, config, lo, win):
    levels = table.shape[0]
    lay, res, dense, bscale, rpb, rsh = _layout_args(config)
    packed = _pack_table(table)
    if packed.shape[1] < lay.r_pad:
        packed = jnp.pad(
            packed, ((0, 0), (0, lay.r_pad - packed.shape[1]), (0, 0)))
    n = positions.shape[0]
    tile_n = min(WIN_TILE_N, n)
    assert n % tile_n == 0
    s_tiles = tile_n // _LANES
    n_tiles = n // tile_n
    nsb_tile = s_tiles // CELL_SUB_BLOCK
    pt = positions.T.reshape(3, n // _LANES, _LANES)
    kernel = functools.partial(_fwd_kernel, ssb=CELL_SUB_BLOCK,
                               nsb_tile=nsb_tile)
    out = pl.pallas_call(
        kernel,
        grid=(levels, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # res
            pl.BlockSpec(memory_space=pltpu.SMEM),   # dense
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bscale
            pl.BlockSpec(memory_space=pltpu.SMEM),   # rpb
            pl.BlockSpec(memory_space=pltpu.SMEM),   # rsh
            pl.BlockSpec(memory_space=pltpu.SMEM),   # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),   # win
            pl.BlockSpec((3, s_tiles, _LANES), lambda l, t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lay.r_pad, _LANES), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, s_tiles, _LANES),
                               lambda l, t: (l, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((levels, 2, n // _LANES, _LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(res, dense, bscale, rpb, rsh, lo, win, pt, packed)
    return out.reshape(levels * 2, n)


def _bwd_pallas(table_shape, positions, g, config, lo, win):
    levels = table_shape[0]
    lay, res, dense, bscale, rpb, rsh = _layout_args(config)
    n = positions.shape[0]
    tile_n = min(WIN_TILE_N, n)
    s_tiles = tile_n // _LANES
    n_tiles = n // tile_n
    nsb_tile = s_tiles // CELL_SUB_BLOCK
    pt = positions.T.reshape(3, n // _LANES, _LANES)
    gt = g.reshape(levels, 2, n // _LANES, _LANES)
    kernel = functools.partial(_bwd_kernel, ssb=CELL_SUB_BLOCK,
                               nsb_tile=nsb_tile)
    dtab = pl.pallas_call(
        kernel,
        grid=(levels, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, s_tiles, _LANES), lambda l, t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, s_tiles, _LANES), lambda l, t: (l, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, lay.r_pad, _LANES),
                               lambda l, t: (l, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((levels, 2, lay.r_pad, _LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(res, dense, bscale, rpb, rsh, lo, win, pt, gt)
    full_r = table_shape[2]
    if full_r >= lay.r_pad:
        dtab = jnp.pad(dtab, ((0, 0), (0, 0), (0, full_r - lay.r_pad),
                              (0, 0)))
    else:
        dtab = dtab[:, :, :full_r]
    return dtab


# ---------------------------------------------------------------------------
# public differentiable entry point
# ---------------------------------------------------------------------------

def _prep(positions):
    sb_n = CELL_SUB_BLOCK * _LANES
    rounded = -(-positions.shape[0] // sb_n) * sb_n
    tile = WIN_TILE_N if rounded > WIN_TILE_N else rounded
    return _pad_positions(positions, tile)


def _prep_anchors(anchor_keys, n_raw, n_padded):
    if anchor_keys is None:
        return None
    nb = anchor_keys.shape[0]
    if nb == 0 or n_raw % nb != 0:
        return None
    stride = n_raw // nb
    if n_padded % stride != 0:
        return None
    pad = n_padded // stride - nb
    if pad:
        anchor_keys = jnp.concatenate(
            [anchor_keys, jnp.broadcast_to(anchor_keys[-1:], (pad,))])
    return anchor_keys


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode_cell(table: jnp.ndarray, positions: jnp.ndarray,
                     config: HashGridConfig,
                     anchor_keys: Optional[jnp.ndarray] = None
                     ) -> jnp.ndarray:
    """Exact 8-corner cell-packed windowed encode of morton-sorted positions.

    table (L, 2, R, 128) f32 with R = table_size/128, interpreted per level
    as (base_row, corner) = (R/8, 8) row interleave; positions (N, 3) in
    [0,1), sorted by ``hash_window.morton_sort_keys`` (unsorted inputs stay
    CORRECT — windows just widen toward full scans). ``anchor_keys``:
    optional monotone per-block sort keys from the marcher
    (ops/occupancy.march_rays block_keys_m). Gradients flow to the table
    only.  Returns FEATURE-MAJOR (L*2, N) like hash_encode_win.
    """
    out, _ = _hc_fwd(table, positions, config, anchor_keys)
    return out


def _hc_fwd(table, positions, config, anchor_keys=None):
    pos_p, n = _prep(positions)
    ak = _prep_anchors(anchor_keys, positions.shape[0], pos_p.shape[0])
    lo, win = cell_window_bases(pos_p, config, anchor_keys=ak)
    if jax.default_backend() == 'tpu':
        out = _fwd_pallas(table, pos_p, config, lo, win)
    else:
        out = _fwd_jnp(table, pos_p, config, lo, win)
    return out[:, :n], (positions, lo, win, table.shape,
                        anchor_keys is not None,
                        None if anchor_keys is None else anchor_keys.shape)


def _hc_bwd(config, res, g):
    positions, lo, win, table_shape, had_ak, ak_shape = res
    pos_p, n = _prep(positions)
    g_p = jnp.pad(g, ((0, 0), (0, pos_p.shape[0] - n)))
    if jax.default_backend() == 'tpu':
        dtab = _bwd_pallas(table_shape, pos_p, g_p, config, lo, win)
    else:
        dtab = _bwd_jnp(table_shape, pos_p, g_p, config, lo, win)
    ak_ct = np.zeros(ak_shape, jax.dtypes.float0) if had_ak else None
    return dtab, jnp.zeros_like(positions), ak_ct


hash_encode_cell.defvjp(_hc_fwd, _hc_bwd)
