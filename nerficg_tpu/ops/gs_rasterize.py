"""Differentiable tile-based Gaussian rasterization — TPU-native design.

Reference equivalent: the external diff-gaussian-rasterization CUDA package
(SURVEY §2.12 N12): EWA project -> frustum cull -> tile binning -> per-tile
depth sort -> per-tile front-to-back rasterization with a hand-derived
backward, all built on atomics and variable-length tile lists.

TPU-native redesign (no atomics, static shapes, autodiff-friendly):
  1. Duplicate each visible Gaussian into a STATIC number of (tile, depth,
     id) entries covering its pixel rect (masked where the rect is smaller).
  2. One global ``lax.sort`` by (tile, depth) — replaces the CUDA radix sort.
     Only integer ids ride along; the sort carries no gradients.
  3. Per-tile segment starts from an MXU histogram (ops/hash_mxu) + cumsum;
     per-tile id lists are contiguous slices of the sorted ids.
  4. Tile attribute tables are fetched with the differentiable MXU factored
     gather (ops.hash_mxu.gather_d) — its VJP is the MXU scatter, which
     replaces the CUDA backward's atomicAdd accumulation into Gaussians.
  5. Per-tile compositing is DENSE: alphas (K, pixels) on the VPU, exclusive
     transmittance via cumprod, weighted color sums on the MXU. Processed in
     tile chunks under ``lax.map`` so autodiff (and rematerialization) are
     free — no hand-derived backward at all.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

__all__ = ['rasterize_gaussians', 'bin_gaussians']

TILE = 16  # pixels per tile side (matches the reference rasterizer)


def _pad_to(x, size, axis=0, fill=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def bin_gaussians(means2d: jnp.ndarray, depths: jnp.ndarray,
                  radii: jnp.ndarray, visible: jnp.ndarray,
                  width: int, height: int,
                  max_tiles_per_gaussian: int = 9,
                  max_per_tile: int = 256) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Assign Gaussians to tiles, depth-sorted per tile.

    Returns (tile_ids (T, K) int32 gaussian indices, tile_counts (T,)).
    Entirely gradient-free (integer bookkeeping).
    """
    num = means2d.shape[0]
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    num_tiles = tiles_x * tiles_y

    means2d = jax.lax.stop_gradient(means2d)
    depths = jax.lax.stop_gradient(depths)
    radii = jax.lax.stop_gradient(radii)

    t_min_x = jnp.clip(((means2d[:, 0] - radii) // TILE).astype(jnp.int32),
                       0, tiles_x - 1)
    t_max_x = jnp.clip(((means2d[:, 0] + radii) // TILE).astype(jnp.int32),
                       0, tiles_x - 1)
    t_min_y = jnp.clip(((means2d[:, 1] - radii) // TILE).astype(jnp.int32),
                       0, tiles_y - 1)
    t_max_y = jnp.clip(((means2d[:, 1] + radii) // TILE).astype(jnp.int32),
                       0, tiles_y - 1)

    # Static duplication: a side x side offset grid anchored at the rect min.
    # Rects larger than the grid are truncated (rare: densification keeps
    # Gaussians small; the reference handles huge splats exactly but they are
    # clipped by opacity pruning anyway).
    rect_w = t_max_x - t_min_x + 1
    j = jnp.arange(max_tiles_per_gaussian, dtype=jnp.int32)
    tx = t_min_x[:, None] + j[None, :] % rect_w[:, None]       # (N, D)
    ty = t_min_y[:, None] + j[None, :] // rect_w[:, None]
    valid = (tx <= t_max_x[:, None]) & (ty <= t_max_y[:, None]) & \
        visible[:, None] & (radii[:, None] > 0)
    tile_of_entry = jnp.where(valid, ty * tiles_x + tx, num_tiles)

    # Global (tile, depth) sort; ids ride along. Padding entries sort last.
    entry_tile = tile_of_entry.reshape(-1)
    entry_depth = jnp.broadcast_to(depths[:, None],
                                   tile_of_entry.shape).reshape(-1)
    entry_id = jnp.broadcast_to(
        jnp.arange(num, dtype=jnp.int32)[:, None],
        tile_of_entry.shape).reshape(-1)
    sorted_tile, _, sorted_id = jax.lax.sort(
        (entry_tile, entry_depth, entry_id), num_keys=2)

    # Per-tile counts via the MXU histogram; starts via exclusive cumsum.
    from nerficg_tpu.ops.hash_mxu import mxu_scatter_add
    seg_pad = -(-(num_tiles + 1) // 128) * 128
    ones = jnp.ones((1, 1, sorted_tile.shape[0]), jnp.float32)
    counts = mxu_scatter_add(sorted_tile[None], ones, seg_pad // 128,
                             compute_dtype=jnp.float32)
    counts = counts.reshape(seg_pad)[:num_tiles].astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts)[:-1]])

    # Contiguous per-tile slices of the sorted id list (block gathers).
    sorted_id_padded = jnp.concatenate(
        [sorted_id, jnp.full((max_per_tile,), num, jnp.int32)])

    def slice_tile(start):
        return jax.lax.dynamic_slice(sorted_id_padded, (start,),
                                     (max_per_tile,))

    tile_ids = jax.vmap(slice_tile)(starts)                    # (T, K)
    tile_counts = jnp.minimum(counts, max_per_tile)
    return tile_ids, tile_counts


# =============================================================================
# Sort-payload pipeline (default): attributes ride the (tile, depth) sort as
# payload operands instead of being fetched per tile slot with the one-hot
# gather — the gather's cost scales with the Gaussian count (4.2 TFLOP at
# N=100k for a 1080p frame, measured 86 ms/frame) while the payload sort is
# O(E log^2 E) data movement (~6 ms for 900k entries). Gradients are routed
# back through two exact permutation sorts (no scatter: TPU scatter of 2M
# rows measured 230+ ms, the inverse sorts ~15 ms).
# =============================================================================


MEANS_FP_SCALE = 32.0       # fixed-point steps per pixel (packed transport)
MEANS_FP_BIAS = 1024.0      # window: tile-relative means in [-1024, +1024)


def _sort_entries_packed(means2d, conics, opacities, colors, depths,
                         tile_of_entry, ent_tx, ent_ty, num_tiles):
    """Inference-only entry sort: 6 u32 operands, one fused key.

    ent_tx/ent_ty/tile_of_entry: (D, N) lane-major per-entry tile data.
    Returns (sorted_tile (E,) i32, sorted_ch (5, E) f32-bitcast payload
    words, starts (T,) i32, counts (T,) i32). starts/counts come from a
    vectorized binary search over the sorted tile ids instead of the MXU
    histogram (the stream is already sorted — counting again is wasted
    work).
    """
    tile_bits = int(num_tiles + 1).bit_length()
    depth_bits = 32 - tile_bits

    # Positive f32 bitcasts are order-preserving, so the top depth_bits of
    # the depth's bit pattern give a monotone quantized depth for free.
    dep_u = jax.lax.bitcast_convert_type(depths, jnp.uint32) >> (
        32 - depth_bits)
    key = ((tile_of_entry.astype(jnp.uint32) << depth_bits) |
           dep_u[None, :].astype(jnp.uint32)).reshape(-1)       # (E,)

    # Tile-relative fixed-point means: each entry stores its mean relative
    # to ITS tile's pixel origin, so u16 carries 1/32-px precision at any
    # image size (absolute bf16 means would quantize to ~8 px at 1080p).
    span = MEANS_FP_BIAS * MEANS_FP_SCALE
    qx = jnp.clip(jnp.round(
        (means2d[None, :, 0] - ent_tx.astype(jnp.float32) * TILE) *
        MEANS_FP_SCALE + span), 0.0, 65535.0).astype(jnp.uint32)
    qy = jnp.clip(jnp.round(
        (means2d[None, :, 1] - ent_ty.astype(jnp.float32) * TILE) *
        MEANS_FP_SCALE + span), 0.0, 65535.0).astype(jnp.uint32)
    mxy = ((qx << 16) | qy).reshape(-1)                         # (E,) u32

    def pair(a, b):
        hi = jax.lax.bitcast_convert_type(
            a.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        lo = jax.lax.bitcast_convert_type(
            b.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        return (hi << 16) | lo

    dup = tile_of_entry.shape[0]

    def dup_flat(col):
        return jnp.broadcast_to(col[None, :],
                                (dup, col.shape[0])).reshape(-1)

    p0 = dup_flat(pair(conics[:, 0], conics[:, 1]))
    p1 = dup_flat(pair(conics[:, 2], opacities))
    p2 = dup_flat(pair(colors[:, 0], colors[:, 1]))
    p3 = dup_flat(pair(colors[:, 2], depths))

    ops = jax.lax.sort((key, mxy, p0, p1, p2, p3), num_keys=1)
    sorted_tile = (ops[0] >> depth_bits).astype(jnp.int32)
    sorted_ch = jnp.stack([
        jax.lax.bitcast_convert_type(c, jnp.float32) for c in ops[1:]])

    # Segment starts/counts by binary search over the sorted tile ids.
    edges = jnp.searchsorted(sorted_tile,
                             jnp.arange(num_tiles + 1, dtype=jnp.int32),
                             side='left')
    starts = edges[:-1].astype(jnp.int32)
    counts = (edges[1:] - edges[:-1]).astype(jnp.int32)
    return sorted_tile, sorted_ch, starts, counts


@jax.custom_vjp
def _permute_entries(tile_key: jnp.ndarray, depth_key: jnp.ndarray,
                     channels: jnp.ndarray):
    """Sort entries by (tile, depth); channels (C, E) ride as payloads.

    Returns (sorted_tile (E,) int32, sorted_channels (C, E)). Differentiable
    in ``channels``: the VJP applies the inverse permutation via one sort.
    """
    out, _ = _permute_entries_fwd(tile_key, depth_key, channels)
    return out


def _permute_entries_fwd(tile_key, depth_key, channels):
    # Keys are float32 (tile ids < 2^24 are exact) so the custom_vjp can
    # return plain zero cotangents for them.
    e = tile_key.shape[0]
    pos = jnp.arange(e, dtype=jnp.int32)
    ops = jax.lax.sort((tile_key, depth_key, pos) + tuple(channels),
                       num_keys=2)
    sorted_tile = ops[0]
    perm = ops[2]
    sorted_channels = jnp.stack(ops[3:])
    return (sorted_tile, sorted_channels), perm


def _permute_entries_bwd(perm, cotangents):
    _, d_sorted = cotangents                       # (C, E)
    ops = jax.lax.sort((perm,) + tuple(d_sorted), num_keys=1)
    d_channels = jnp.stack(ops[1:])
    return (jnp.zeros(perm.shape, jnp.float32),
            jnp.zeros(perm.shape, jnp.float32), d_channels)


_permute_entries.defvjp(_permute_entries_fwd, _permute_entries_bwd)




def rasterize_gaussians(means2d: jnp.ndarray, depths: jnp.ndarray,
                        conics: jnp.ndarray, radii: jnp.ndarray,
                        colors: jnp.ndarray, opacities: jnp.ndarray,
                        visible: jnp.ndarray, width: int, height: int,
                        background: jnp.ndarray,
                        max_tiles_per_gaussian: int = 9,
                        max_per_tile: int = 256,
                        tile_chunk: int = 64,
                        packed_inference: bool = False) -> dict:
    """Full differentiable rasterization from projected Gaussians.

    means2d (N,2), depths (N,), conics (N,3), radii (N,), colors (N,3),
    opacities (N,), visible (N,) -> image dict (rgb/alpha/depth HxWxC).
    Gradients flow to means2d, conics, colors, opacities (and depths via the
    depth output) — matching the CUDA rasterizer's differentiable inputs
    (SURVEY §2.12 N12).
    """
    num = means2d.shape[0]
    k = max_per_tile
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    num_tiles = tiles_x * tiles_y

    m2d_i = jax.lax.stop_gradient(means2d)
    dep_i = jax.lax.stop_gradient(depths)
    rad_i = jax.lax.stop_gradient(radii)
    t_min_x = jnp.clip(((m2d_i[:, 0] - rad_i) // TILE).astype(jnp.int32),
                       0, tiles_x - 1)
    t_max_x = jnp.clip(((m2d_i[:, 0] + rad_i) // TILE).astype(jnp.int32),
                       0, tiles_x - 1)
    t_min_y = jnp.clip(((m2d_i[:, 1] - rad_i) // TILE).astype(jnp.int32),
                       0, tiles_y - 1)
    t_max_y = jnp.clip(((m2d_i[:, 1] + rad_i) // TILE).astype(jnp.int32),
                       0, tiles_y - 1)
    # Per-gaussian linearized rect enumeration: entry j of a gaussian with
    # rect (w, h) covers tile (min_x + j % w, min_y + j // w). Unlike a
    # fixed side x side offset grid this covers ANY rect of <= D cells
    # exactly (2x3 and 3x2 both fit in D=6), so the duplication factor can
    # be smaller at equal coverage.
    # Layout note: all per-entry arrays are (D, N) — N on the minor (lane)
    # axis, so every VPU op runs 128 lanes wide. (N, D=6) would light 6 of
    # 128 lanes. The entry order feeding the sort is irrelevant.
    rect_w = t_max_x - t_min_x + 1                              # (N,)
    j = jnp.arange(max_tiles_per_gaussian, dtype=jnp.int32)     # (D,)
    tx = t_min_x[None, :] + j[:, None] % rect_w[None, :]
    ty = t_min_y[None, :] + j[:, None] // rect_w[None, :]
    dup_valid = (tx <= t_max_x[None, :]) & (ty <= t_max_y[None, :]) & \
        visible[None, :] & (rad_i[None, :] > 0)
    # Exact circle-vs-tile cull: the bbox covers the 3-sigma circle, so its
    # corner tiles the circle misses contribute nothing the radius
    # truncation would keep. Dropping them shrinks per-tile segments ~25%
    # (the CUDA rasterizers' tile intersection test, done branch-free).
    cpx = jnp.clip(m2d_i[None, :, 0], tx.astype(jnp.float32) * TILE,
                   tx.astype(jnp.float32) * TILE + TILE)
    cpy = jnp.clip(m2d_i[None, :, 1], ty.astype(jnp.float32) * TILE,
                   ty.astype(jnp.float32) * TILE + TILE)
    dcx = cpx - m2d_i[None, :, 0]
    dcy = cpy - m2d_i[None, :, 1]
    dup_valid &= (dcx * dcx + dcy * dcy) <= (rad_i * rad_i)[None, :]
    tile_of_entry = jnp.where(dup_valid, ty * tiles_x + tx, num_tiles)

    if packed_inference:
        # Gradient-free fast path: ONE fused u32 sort key (tile high bits |
        # truncated positive-f32 depth bits, bitcast order == value order)
        # and 5 packed payload words — 6 sort operands instead of 9 (keys
        # included; the sort is the dominant inference cost, PERF_NOTES.md):
        #   word 0: tile-RELATIVE means as a u16.u16 fixed-point pair
        #           (1/32 px steps over a +-1024 px window — means need
        #           sub-pixel precision, which bf16 cannot carry at 1080p)
        #   words 1-4: bf16 pairs ca|cb, cc|op, r|g, b|d.
        sorted_tile, sorted_ch, starts, counts = _sort_entries_packed(
            means2d, conics, opacities, colors, depths,
            tile_of_entry, tx, ty, num_tiles)
        n_ch = sorted_ch.shape[0]
        e = sorted_tile.shape[0]
    else:
        # Entry channels: the attribute payload duplicated per covered tile.
        attrs = jnp.stack([
            means2d[:, 0], means2d[:, 1],
            conics[:, 0], conics[:, 1], conics[:, 2],
            opacities, colors[:, 0], colors[:, 1], colors[:, 2], depths,
        ], axis=0)                                              # (C=10, N)
        n_ch = attrs.shape[0]
        dup = tile_of_entry.shape[0]
        channels = jnp.broadcast_to(
            attrs[:, None, :],
            (n_ch, dup, attrs.shape[1])).reshape(n_ch, -1)
        entry_tile = tile_of_entry.reshape(-1)
        entry_depth = jnp.broadcast_to(dep_i[None, :],
                                       tile_of_entry.shape).reshape(-1)

        sorted_tile_f, sorted_ch = _permute_entries(
            entry_tile.astype(jnp.float32), entry_depth, channels)
        sorted_tile = sorted_tile_f.astype(jnp.int32)
        e = entry_tile.shape[0]

        # Segment starts/counts by binary search over the sorted tile ids
        # (the stream is already sorted — the MXU histogram + cumsum this
        # replaces re-counted what the sort established).
        edges = jnp.searchsorted(sorted_tile,
                                 jnp.arange(num_tiles + 1, dtype=jnp.int32),
                                 side='left')
        starts = edges[:-1].astype(jnp.int32)
        counts = (edges[1:] - edges[:-1]).astype(jnp.int32)

    # Fused slice+composite straight from the sorted stream (the slot
    # tensors never materialize; see ops/gs_tiles_kernel.composite_sorted).
    # The stream stays CHANNEL-MAJOR (width, E_pad): entries on the lane
    # axis need no minor-dim padding in the Pallas kernels (entry-major was
    # relayout-padded by Mosaic to 128 channels: 8-16x footprint/traffic).
    from nerficg_tpu.ops.gs_tiles_kernel import composite_sorted
    e_pad = (-(-(e + 3 * k) // k)) * k
    pad_ch = (8 if packed_inference else 16) - n_ch
    sorted_mat = jnp.concatenate(
        [sorted_ch, jnp.zeros((n_ch, e_pad - e), sorted_ch.dtype)], axis=1)
    sorted_mat = jnp.concatenate(
        [sorted_mat, jnp.zeros((pad_ch, e_pad), sorted_ch.dtype)], axis=0)
    out = composite_sorted(sorted_mat, starts, counts, tiles_x, num_tiles, k)
    result = _assemble_tiles(out, width, height, background)
    # Coverage-loss diagnostics (the reference handles huge splats and deep
    # tiles exactly; the static budgets here truncate - surface the loss
    # instead of dropping it silently).
    rect_h = t_max_y - t_min_y + 1
    demanded = rect_w * rect_h
    result['overflow_gaussians'] = jnp.sum(
        ((demanded > max_tiles_per_gaussian) & visible &
         (rad_i > 0)).astype(jnp.int32))
    result['overflow_entries'] = jnp.sum(
        jnp.maximum(counts - k, 0))
    return result




def _assemble_tiles(out: jnp.ndarray, width: int, height: int,
                    background: jnp.ndarray) -> dict:
    """(T, 8, P) per-tile composites -> image dict."""
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    rgb = out[:, 0:3].transpose(0, 2, 1)
    acc = out[:, 3]
    dep = out[:, 4]

    def to_image(tile_data, chs):
        img = tile_data.reshape(tiles_y, tiles_x, TILE, TILE, chs)
        img = img.transpose(0, 2, 1, 3, 4).reshape(
            tiles_y * TILE, tiles_x * TILE, chs)
        return img[:height, :width]

    image = to_image(rgb, 3)
    alpha_img = to_image(acc[..., None], 1)
    depth_img = to_image(dep[..., None], 1) / jnp.maximum(alpha_img, 1e-10)
    image = image + (1.0 - alpha_img) * jnp.asarray(background, image.dtype)
    return {'rgb': image, 'alpha': alpha_img, 'depth': depth_img}
