"""Occupancy-grid ray marching with static-shape sample compaction.

Reference equivalents (SURVEY §2.12):
  * N4 ``raymarching_train`` (VolumeRenderingV2/csrc/raymarching.cu:166-331):
    per-ray DDA through an occupancy bitfield with atomic global compaction.
  * N5 ``raymarching_test`` (:335-456): incremental alive-ray marching.
  * N6/N7 composite kernels (volumerendering.cu:7-290): front-to-back blending
    over variable-length packed segments with hand-derived backward.

TPU-first redesign (no global atomics, no dynamic shapes):
  1. March a *fixed* number of candidate steps per ray; occupancy lookups are
     cheap gathers from the 128^3 grid (no MLP).
  2. Compact occupied samples with ``jnp.nonzero(..., size=BUDGET)`` — a
     static-size sort-free compaction; the budget plays the role of the CUDA
     kernels' global sample counter.
  3. Evaluate the field MLP only on the compacted samples (one large dense
     matmul -> MXU) — this preserves the ~10x empty-space-skipping win.
  4. Composite on the compacted layout with segment ops: the exclusive
     per-ray transmittance prefix is a global cumsum of log(1-alpha) minus a
     per-segment offset (segment_max trick), and outputs are segment_sums.
     Autodiff provides the backward; no hand-derived kernel needed.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ['MarchResults', 'march_rays', 'composite_packed',
           'occupancy_lookup', 'update_density_grid']


class MarchResults(NamedTuple):
    """Compacted samples (all arrays static-shaped to the budget)."""
    positions: jnp.ndarray    # (B, 3) world-space sample positions
    directions: jnp.ndarray   # (B, 3) per-sample ray directions
    ts: jnp.ndarray           # (B,) depth along ray
    deltas: jnp.ndarray       # (B,) step size
    ray_ids: jnp.ndarray      # (B,) owning ray (== num_rays for padding)
    valid: jnp.ndarray        # (B,) bool validity
    num_valid: jnp.ndarray    # () number of real samples
    ray_complete: jnp.ndarray  # (R,) bool: ray's samples all fit the budget
    num_blocks: jnp.ndarray   # () occupied blocks over the whole batch
                              # (budget utilization = num_blocks*block/budget)
    # Morton-ordered view for the windowed encode (``morton=True``): the
    # same compacted blocks re-expanded in block-morton order, plus the
    # block permutations to route field outputs back to ray order.
    positions_m: Optional[jnp.ndarray] = None   # (B, 3)
    directions_m: Optional[jnp.ndarray] = None  # (B, 3)
    ray_ids_m: Optional[jnp.ndarray] = None     # (B,)
    perm_to_ray: Optional[jnp.ndarray] = None   # (Bb,) morton slot of block i
    perm_to_morton: Optional[jnp.ndarray] = None  # (Bb,) block at morton slot
    # Sorted block morton keys (Bb,) — monotone by construction, the anchor
    # stream for the windowed encode's per-sub-block table windows
    # (per-sample keys are NOT monotone across octant planes; see
    # ops/hash_window.window_bases).
    block_keys_m: Optional[jnp.ndarray] = None


def _hash_jitter(flat_ids: jnp.ndarray, seed) -> jnp.ndarray:
    """Deterministic per-sample uniform jitter in [0,1) from a counter hash.

    Recomputable at compacted sample indices without gathering a (R*S,)
    table; seed=None yields the deterministic midpoint 0.5 (inference)."""
    if seed is None:
        return jnp.full(flat_ids.shape, 0.5, jnp.float32)
    h = (flat_ids.astype(jnp.uint32) * jnp.uint32(2654435761)) ^ seed
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x45d9f3b)
    h = h ^ (h >> 16)
    return (h >> 8).astype(jnp.float32) / jnp.float32(1 << 24)


def occupancy_lookup(grid_binary: jnp.ndarray, positions_unit: jnp.ndarray,
                     resolution: int) -> jnp.ndarray:
    """Occupancy of positions in [0,1]^3 from a flat boolean grid (res^3,)."""
    coords = jnp.clip((positions_unit * resolution).astype(jnp.int32),
                      0, resolution - 1)
    flat = (coords[..., 0] * resolution + coords[..., 1]) * resolution + \
        coords[..., 2]
    return grid_binary[flat]


def occupancy_lookup_mxu(grid_f32: jnp.ndarray, positions_unit: jnp.ndarray,
                         resolution: int) -> jnp.ndarray:
    """MXU-path occupancy test: XLA's per-element gather is serial on TPU
    (~100ns/row), so millions of skip-grid probes per step would dominate the
    marcher. The grid is kept as a (1, 1, res^3/128, 128) float 0/1 table and
    probed through ops.hash_mxu.mxu_gather (factored one-hot matmul).

    grid_f32: (1, 1, res^3 // 128, 128) float32 of {0, 1}.
    positions_unit: (..., 3) in [0, 1].
    Returns (...,) bool.
    """
    from nerficg_tpu.ops.hash_mxu import mxu_gather
    coords = jnp.clip((positions_unit * resolution).astype(jnp.int32),
                      0, resolution - 1)
    flat = (coords[..., 0] * resolution + coords[..., 1]) * resolution + \
        coords[..., 2]
    shape = flat.shape
    vals = mxu_gather(flat.reshape(1, -1), grid_f32)   # (1, 1, M)
    return (vals.reshape(shape) > 0.5)


def downsample_occupancy(density_grid: jnp.ndarray, resolution: int,
                         march_resolution: int, threshold: float) -> jnp.ndarray:
    """Max-pool the (res^3,) density grid to a coarse marching skip-grid as
    a bit-packed (mres^3/32/128, 128) int32 bitfield (ops/xbar_gather.py).

    The fine grid thresholds density for compositing quality; the coarse grid
    only needs to be conservative (a coarse cell is occupied if ANY child is).
    Bit packing shrinks the crossbar gather extent 32x vs one word per cell
    (reference equivalent: the ``packbits`` CUDA kernel, raymarching.cu:123).
    """
    from nerficg_tpu.ops.xbar_gather import pack_bits
    factor = resolution // march_resolution
    g = density_grid.reshape(resolution, resolution, resolution)
    g = g.reshape(march_resolution, factor, march_resolution, factor,
                  march_resolution, factor)
    coarse = g.max(axis=(1, 3, 5))
    return pack_bits((coarse > threshold).reshape(-1))


def march_rays(origins: jnp.ndarray, directions: jnp.ndarray,
               aabb_min: jnp.ndarray, aabb_max: jnp.ndarray,
               grid_binary: jnp.ndarray, grid_resolution: int,
               max_steps: int, sample_budget: int,
               rng: Optional[jax.Array] = None,
               min_near: float = 0.05,
               block: int = 32,
               exponential: bool = False,
               probe_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]]
               = None,
               morton: bool = False,
               probes_per_block: int = 2) -> MarchResults:
    """Fixed-step occupancy-skipping ray marcher (replaces CUDA N4).

    origins/directions: (R, 3); directions unit-norm.
    grid_binary: (res^3,) bool occupancy, OR the MXU layout
      (1, 1, res^3/128, 128) float 0/1 (fast path on TPU).
    Returns compacted samples with a static ``sample_budget``.

    Compaction happens at BLOCK granularity (``block`` consecutive steps of
    one ray): occupied samples form contiguous runs along rays, so blocks are
    mostly full-or-empty, and block compaction turns the per-sample stream
    compaction (a 35ms jnp.nonzero over R*S elements on TPU) into a ~5ms
    nonzero over R*S/block block flags. Partially-filled boundary blocks
    carry per-sample validity masks.

    ``exponential``: geometric step spacing t_i = t_near * r^i with
    r = (t_far/t_near)^(1/S) — the static-shape equivalent of the
    reference's distance-proportional steps for unbounded scenes
    (InstantNGP/Renderer.py:141-152, EXPONENTIAL_STEPS).
    ``probe_fn``: optional occupancy test positions_world -> bool, used
    for multi-cascade grids (the default probes ``grid_binary`` over the
    scene AABB).
    """
    num_rays = origins.shape[0]
    block = min(block, max_steps)
    assert max_steps % block == 0, 'max_steps must divide by the block size'
    # Round the budget up to a whole number of blocks (static).
    sample_budget = -(-sample_budget // block) * block
    t_near, t_far = _ray_aabb(origins, directions, aabb_min, aabb_max, min_near)
    # Degenerate (zero) directions come from batch padding - treat as misses
    # so they cannot poison the chunk with huge ts/deltas.
    nonzero_dir = jnp.sum(directions * directions, axis=-1) > 1e-12
    hit = (t_near < t_far) & nonzero_dir
    t_far = jnp.where(hit, t_far, t_near + 1.0)
    if exponential:
        # Geometric spacing: rate channel carries log(r) per ray.
        rate = jnp.log(jnp.maximum(t_far / t_near, 1.0 + 1e-6)) / max_steps
    else:
        rate = (t_far - t_near) / max_steps                    # dt (R,)

    if rng is not None:
        seed = jax.random.bits(rng, dtype=jnp.uint32)
    else:
        seed = None

    # --- block-level candidate pass -----------------------------------------
    # The skip grid is far coarser than the fine step spacing (a 64^3 cell
    # spans ~15 of 512 steps), so probing every candidate STEP oversamples
    # it ~5x. Candidates are therefore probed at ``probes_per_block``
    # fractions of each block only (a cell always covers several probe
    # points); per-SAMPLE validity is re-probed exactly during expansion, so
    # only block selection coarsens, never sample masking. The default of 2
    # keeps the probe gap (block/2 = 4 steps) well under a cell crossing AND
    # makes blocks_per_ray * P a lane multiple at the operating point
    # (64 * 2 = 128), so the probe plane reshapes are layout-free.
    blocks_per_ray = max_steps // block
    nblocks = num_rays * blocks_per_ray
    block_budget = sample_budget // block
    pfrac = (jnp.arange(probes_per_block, dtype=jnp.float32) + 0.5) \
        / probes_per_block
    bidx = jnp.arange(blocks_per_ray, dtype=jnp.float32)
    step_pos = ((bidx[:, None] + pfrac[None, :]) * block
                ).reshape(-1)                                  # (Bp*P,)
    if exponential:
        ts_p = t_near[:, None] * jnp.exp(step_pos[None] * rate[:, None])
    else:
        ts_p = t_near[:, None] + step_pos[None] * rate[:, None]  # (R, BpP)
    # Per-axis coordinate PLANES: trailing (..., 3) coordinate vectors force
    # lane-hostile tiled layouts around the probe kernel (measured 1.6 ms of
    # pure relayout copies at 8192x64x3xP); 2D planes fuse cleanly.
    px = origins[:, 0:1] + directions[:, 0:1] * ts_p
    py = origins[:, 1:2] + directions[:, 1:2] * ts_p
    pz = origins[:, 2:3] + directions[:, 2:3] * ts_p
    ext = aabb_max - aabb_min
    ux = (px - aabb_min[0]) / ext[0]
    uy = (py - aabb_min[1]) / ext[1]
    uz = (pz - aabb_min[2]) / ext[2]
    in_box = ((ux >= 0.0) & (ux < 1.0) & (uy >= 0.0) & (uy < 1.0) &
              (uz >= 0.0) & (uz < 1.0))
    if probe_fn is not None:
        occupied = probe_fn(px, py, pz)
    elif grid_binary.ndim == 2:
        from nerficg_tpu.ops.xbar_gather import occupancy_probe_xyz
        occupied = occupancy_probe_xyz(grid_binary, ux, uy, uz,
                                       grid_resolution)
    else:
        occupied = occupancy_lookup(
            grid_binary, jnp.stack([ux, uy, uz], axis=-1), grid_resolution)
    block_any2 = (occupied & in_box).reshape(
        num_rays, blocks_per_ray, probes_per_block).any(axis=2) \
        & hit[:, None]                                         # (R, Bp)

    # --- block compaction (replaces the CUDA atomic counter) ----------------
    # One masked-morton sort compacts AND spatially orders the occupied
    # blocks (jnp.nonzero over the 524k block flags measured 4.6 ms; the
    # 2-operand sort does the same work and hands the windowed encode its
    # morton stream for free). Ray order is recovered from the compacted
    # 32k set with a second, much smaller sort.
    from nerficg_tpu.ops.hash_window import morton_keys_xyz
    pstride = probes_per_block
    bkeys = morton_keys_xyz(
        jnp.clip(ux[:, ::pstride], 0.0, 1.0 - 1e-6),
        jnp.clip(uy[:, ::pstride], 0.0, 1.0 - 1e-6),
        jnp.clip(uz[:, ::pstride], 0.0, 1.0 - 1e-6))           # (R, Bp)
    inf = jnp.int32(1 << 30)
    key_flat = jnp.where(block_any2, bkeys, inf).reshape(-1)
    blk_iota = jnp.arange(nblocks, dtype=jnp.int32)
    k_sorted, blk_sorted = jax.lax.sort((key_flat, blk_iota), num_keys=1)
    take = min(block_budget, nblocks)
    pad_b = block_budget - take
    block_sel_m = jnp.pad(blk_sorted[:take], (0, pad_b))       # morton order
    block_valid_m = jnp.pad(k_sorted[:take] < inf, (0, pad_b))
    # Padding blocks expand at the LAST valid block's geometry (not block 0
    # of ray 0, which sits at an arbitrary corner of the box): the morton
    # tail then stays spatially tight and the windowed encode's trailing
    # sub-block windows don't blow up to cover the stray corner.
    nvalid_b = jnp.sum(block_any2)
    last_valid = blk_sorted[jnp.clip(nvalid_b - 1, 0, nblocks - 1)]
    safe_block_m = jnp.where(block_valid_m, block_sel_m, last_valid)
    # ray-major view (ascending block index == nonzero's output order)
    ray_key = jnp.where(block_valid_m, block_sel_m, jnp.int32(nblocks))
    bb_iota = jnp.arange(block_budget, dtype=jnp.int32)
    rk_sorted, blk_ray, perm_to_ray = jax.lax.sort(
        (ray_key, block_sel_m, bb_iota), num_keys=1)
    block_valid = rk_sorted < nblocks
    safe_block = jnp.where(block_valid, blk_ray, 0)

    # Per-ray constants fetched with a plain XLA row gather: at this shape
    # (32k gathers of 8-float rows from an 8k-row table) it measures
    # 0.13 ms vs 8.6 ms for the MXU factored gather — the "row gather is
    # dead" rule (PERF_NOTES.md) only holds for huge tables with tiny rows.
    ray_table = jnp.stack([
        t_near, rate,
        origins[:, 0], origins[:, 1], origins[:, 2],
        directions[:, 0], directions[:, 1], directions[:, 2],
    ], axis=1)                                                 # (R, 8)

    def _expand(safe_blk, blk_valid, probe=True):
        """Blocks -> samples: positions/ts/deltas/dirs/validity. Pure
        arithmetic + one small per-ray gather, so it can run twice (once
        ray-ordered for compositing, once morton-ordered for the encode —
        the latter with ``probe=False``: per-sample validity is only
        consumed in ray order, so the second occupancy probe is skipped)."""
        ray_of_block = safe_blk // blocks_per_ray              # (Bb,)
        block_in_ray = safe_blk - ray_of_block * blocks_per_ray
        fetched = ray_table[ray_of_block]                      # (Bb, 8)
        b_tnear, b_rate = fetched[:, 0], fetched[:, 1]
        offs = jnp.arange(block, dtype=jnp.float32)[None, :]
        sample_step = block_in_ray[:, None].astype(jnp.float32) * block + offs
        sample_flat_id = (ray_of_block[:, None] * max_steps
                          ).astype(jnp.uint32) + sample_step.astype(jnp.uint32)
        s_jitter = _hash_jitter(sample_flat_id, seed)
        if exponential:
            out_ts = b_tnear[:, None] * jnp.exp(
                (sample_step + s_jitter) * b_rate[:, None])
            out_dt = out_ts * (jnp.exp(b_rate[:, None]) - 1.0)
        else:
            out_ts = (b_tnear[:, None] +
                      (sample_step + s_jitter) * b_rate[:, None])
            out_dt = jnp.broadcast_to(b_rate[:, None], out_ts.shape)
        # Per-axis sample planes (Bb, block); the (..., 3) stack happens once
        # at the very end (see the candidate pass for the layout rationale).
        spx = fetched[:, 2:3] + fetched[:, 5:6] * out_ts
        spy = fetched[:, 3:4] + fetched[:, 6:7] * out_ts
        spz = fetched[:, 4:5] + fetched[:, 7:8] * out_ts
        if probe:
            # Per-sample validity: recheck occupancy at the expanded samples
            # (cheap second probe) so partially-filled blocks are masked.
            ext_e = aabb_max - aabb_min
            sux = (spx - aabb_min[0]) / ext_e[0]
            suy = (spy - aabb_min[1]) / ext_e[1]
            suz = (spz - aabb_min[2]) / ext_e[2]
            in_box_s = ((sux >= 0.0) & (sux < 1.0) & (suy >= 0.0) &
                        (suy < 1.0) & (suz >= 0.0) & (suz < 1.0))
            if probe_fn is not None:
                occ_s = probe_fn(spx, spy, spz)
            elif grid_binary.ndim == 2:
                from nerficg_tpu.ops.xbar_gather import occupancy_probe_xyz
                occ_s = occupancy_probe_xyz(grid_binary, sux, suy, suz,
                                            grid_resolution)
            else:
                occ_s = occupancy_lookup(
                    grid_binary, jnp.stack([sux, suy, suz], axis=-1),
                    grid_resolution)
            valid_s = occ_s & in_box_s & blk_valid[:, None]    # (Bb, block)
        else:
            valid_s = jnp.broadcast_to(blk_valid[:, None],
                                       (safe_blk.shape[0], block))
        out_pos = jnp.stack([spx, spy, spz], axis=-1)          # (Bb, blk, 3)
        out_dirs = jnp.broadcast_to(fetched[:, None, 5:8],
                                    out_pos.shape).reshape(-1, 3)
        return (out_pos.reshape(-1, 3), out_dirs, out_ts.reshape(-1),
                out_dt.reshape(-1), ray_of_block, valid_s)

    out_pos, out_dirs, out_ts, out_dt, ray_of_block, valid2 = _expand(
        safe_block, block_valid)
    valid = valid2.reshape(-1)
    ray_ids = jnp.broadcast_to(ray_of_block[:, None],
                               valid2.shape).reshape(-1)
    num_valid = jnp.sum(valid)
    # Budget-overflow accounting at block granularity: a ray is complete iff
    # the running count of occupied blocks up to its end fits the budget.
    occ_blocks_per_ray = block_any2.sum(axis=1)
    cum_blocks = jnp.cumsum(occ_blocks_per_ray)
    ray_complete = cum_blocks <= block_budget
    num_blocks = cum_blocks[-1]

    # Only samples of PADDING blocks are remapped to the drop segment R.
    # In-block invalid samples (occupancy gaps inside a ray) KEEP their real
    # ray id: their alpha is masked to zero in composite_packed, so they are
    # harmless there, while remapping them would split a ray into several
    # runs and corrupt the per-ray transmittance offset (is_first would fire
    # at every run start and the offsets would sum several prefix values).
    pad_samples = jnp.broadcast_to(block_valid[:, None],
                                   (block_budget, block)).reshape(-1)
    ray_ids = jnp.where(pad_samples, ray_ids, num_rays)

    extras = {}
    if morton:
        # Morton-ordered re-expansion for the windowed encode: the
        # compaction sort above already produced the morton-ordered block
        # set and the morton->ray permutation; only its inverse is left.
        _, perm_to_morton = jax.lax.sort((perm_to_ray, bb_iota), num_keys=1)
        pos_m, dirs_m, _, _, ray_of_block_m, _ = _expand(
            safe_block_m, block_valid_m, probe=False)
        ray_ids_m = jnp.broadcast_to(
            ray_of_block_m[:, None], (block_budget, block)).reshape(-1)
        # Anchor keys for the windowed encode: clamp the invalid tail to the
        # last valid key (matching the last_valid geometry above) so the
        # sequence stays monotone.
        keys_taken = jnp.pad(k_sorted[:take], (0, pad_b))
        last_key = k_sorted[jnp.clip(nvalid_b - 1, 0, nblocks - 1)]
        block_keys_m = jnp.where(block_valid_m, keys_taken, last_key)
        extras = dict(positions_m=pos_m, directions_m=dirs_m,
                      ray_ids_m=ray_ids_m, perm_to_ray=perm_to_ray,
                      perm_to_morton=perm_to_morton,
                      block_keys_m=block_keys_m)

    return MarchResults(positions=out_pos, directions=out_dirs,
                        ts=out_ts, deltas=out_dt, ray_ids=ray_ids,
                        valid=valid, num_valid=num_valid,
                        ray_complete=ray_complete, num_blocks=num_blocks,
                        **extras)


def _ray_aabb(origins, directions, aabb_min, aabb_max, min_near):
    inv = 1.0 / jnp.where(jnp.abs(directions) < 1e-10,
                          jnp.where(directions >= 0, 1e-10, -1e-10), directions)
    t0 = (aabb_min - origins) * inv
    t1 = (aabb_max - origins) * inv
    t_near = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), min_near)
    t_far = jnp.min(jnp.maximum(t0, t1), -1)
    return t_near, t_far


def composite_packed(densities: jnp.ndarray, rgbs: jnp.ndarray,
                     march: MarchResults, num_rays: int,
                     background: Optional[jnp.ndarray] = None,
                     early_stop_eps: float = 1e-4,
                     block: int = 8) -> dict:
    """Front-to-back compositing on the compacted layout (replaces CUDA N6/N7).

    densities: (B,) field densities at the compacted samples.
    rgbs: (B, 3) field colors.
    Samples of one ray are contiguous and depth-ordered (nonzero preserves
    flat order). Exclusive transmittance per sample:
        T_i = exp(sum_{j<i, same ray} log(1 - alpha_j))
    computed as global-cumsum minus per-segment offset.

    ``block``: the marcher's compaction block size. The MXU segment
    scatter/gathers cost ~linear in the number of scattered elements, and a
    block is uniform in ray id by construction (padding blocks are remapped
    wholly; in-block invalid samples keep their ray id with alpha==0), so all
    segment reductions run at BLOCK granularity — ``block``x cheaper — with
    the within-block prefix handled by a log2(block)-step doubling scan.
    Pass ``block=1`` for arbitrary (non-block-compacted) sample streams.

    ``rgbs`` may be sample-major (B, 3) or channel-major (3, B); the
    channel-major form is preferred on TPU (a (B, 3) array lights 3 of 128
    lanes and every slice/transpose of it relayouts) and is what the
    renderer's permuted channel stack naturally produces.
    """
    from nerficg_tpu.ops.hash_mxu import gather_d, scatter_add_d

    b_total = densities.shape[0]
    if block > 1 and b_total % block != 0:
        block = 1
    if rgbs.shape[0] == 3 and rgbs.shape[-1] == b_total and b_total != 3:
        rgb_r, rgb_g, rgb_b = rgbs[0], rgbs[1], rgbs[2]
    else:
        rgb_r, rgb_g, rgb_b = rgbs[:, 0], rgbs[:, 1], rgbs[:, 2]

    alpha = 1.0 - jnp.exp(-densities * march.deltas)
    alpha = jnp.where(march.valid, alpha, 0.0)
    log_t = jnp.log1p(-jnp.clip(alpha, 0.0, 1.0 - 1e-7))        # (B,) <= 0

    # Segments padded to a lane multiple; padding rays land in segment
    # ``num_rays`` and are dropped.
    seg_pad = ((num_rays + 1 + 127) // 128) * 128
    seg_rows = seg_pad // 128

    if block > 1:
        nb = b_total // block
        lt2 = log_t.reshape(nb, block)
        csum_in = jnp.cumsum(lt2, axis=1)                        # within-block
        block_total = csum_in[:, -1]                             # (Bb,)
        block_csum = jnp.cumsum(block_total)
        block_excl = block_csum - block_total                    # (Bb,)
        excl = (block_excl[:, None] + csum_in - lt2).reshape(-1)
        ray_of_block = march.ray_ids.reshape(nb, block)[:, 0]
        seg_ids = ray_of_block[None]                             # (1, Bb)
        prev_ids = jnp.concatenate(
            [jnp.full((1,), -1, ray_of_block.dtype), ray_of_block[:-1]])
        is_first = (ray_of_block != prev_ids).astype(excl.dtype)
        offsets = scatter_add_d(seg_ids, (block_excl * is_first)[None, None],
                                seg_rows)
        offset_b = gather_d(seg_ids, offsets)[0, 0]              # (Bb,)
        offset_per_sample = jnp.repeat(offset_b, block)
    else:
        csum = jnp.cumsum(log_t)                                 # inclusive
        excl = csum - log_t                                      # exclusive
        seg_ids = march.ray_ids[None]                            # (1, B)
        prev_ids = jnp.concatenate(
            [jnp.full((1,), -1, march.ray_ids.dtype), march.ray_ids[:-1]])
        is_first = (march.ray_ids != prev_ids).astype(excl.dtype)
        offsets = scatter_add_d(seg_ids, (excl * is_first)[None, None],
                                seg_rows)
        offset_per_sample = gather_d(seg_ids, offsets)[0, 0]     # (B,)

    # The exponent is <= 0 for real samples; padding samples (segment
    # num_rays) can have garbage offsets making it hugely positive, and the
    # resulting inf poisons the VJP even though the forward masks it
    # (where's backward computes 0 * inf = NaN). Clamp before exp.
    trans = jnp.exp(jnp.minimum(excl - offset_per_sample, 0.0))
    trans = jnp.where(march.valid, trans, 0.0)
    weights = trans * alpha
    if early_stop_eps > 0.0:
        # Zero contributions once transmittance is negligible (mirrors the
        # CUDA early termination at T <= 1e-4 — here a mask, not a branch).
        weights = jnp.where(trans > early_stop_eps, weights, 0.0)

    # One 5-channel segment sum: [rgb, acc, weighted depth] — partial-summed
    # within each block first, then scattered at block granularity.
    channels = jnp.stack([weights * rgb_r, weights * rgb_g,
                          weights * rgb_b, weights,
                          weights * march.ts], axis=0)           # (5, B)
    if block > 1:
        channels = channels.reshape(5, b_total // block, block).sum(-1)
    sums = scatter_add_d(seg_ids, channels[None], seg_rows)     # (1, 5, r, 128)
    sums = sums.reshape(5, seg_pad)[:, :num_rays]
    rgb = sums[:3].T                                             # (R, 3)
    acc = sums[3][:, None]
    depth = sums[4][:, None] / jnp.maximum(acc, 1e-10)
    if background is not None:
        rgb = rgb + (1.0 - acc) * jnp.asarray(background, rgb.dtype)
    return {'rgb': rgb, 'depth': depth, 'alpha': acc, 'weights': weights,
            'sample_ray_ids': march.ray_ids}


def update_density_grid(density_grid: jnp.ndarray,
                        query_fn: Callable[[jnp.ndarray], jnp.ndarray],
                        aabb_min: jnp.ndarray, aabb_max: jnp.ndarray,
                        resolution: int, rng: jax.Array,
                        num_samples: int, decay: float = 0.95,
                        warmup: bool = False,
                        position_fn: Optional[Callable] = None,
                        carve_mask: Optional[jnp.ndarray] = None,
                        occupied_bias: float = 0.5,
                        occupied_threshold: float = 0.0
                        ) -> jnp.ndarray:
    """EMA-decay max-update of the density grid (replaces the morton-sampled
    CUDA update, reference: InstantNGP/Renderer.py:245-272).

    density_grid: (res^3,) float. query_fn: positions (M,3)->(M,) densities.
    During warmup all cells are refreshed; afterwards a rotating slab is
    updated, with its start biased toward currently-occupied regions
    ``occupied_bias`` of the time (see below).
    """
    total = density_grid.shape[0]      # res^3, or cascades * res^3
    k_cells, k_jitter, k_stream, k_bin = jax.random.split(rng, 4)
    if warmup:
        num_samples = total
    num_samples = min(num_samples, total)
    # Rotating contiguous slab refresh with a random circular start: XLA's
    # scatter-max over random cells is serial on TPU (~100ns/row), while a
    # roll + dense slice update is a pure copy. The reference additionally
    # samples currently-OCCUPIED cells each update (Renderer.py:252-258) so
    # stale geometry re-validates faster; scattering to random occupied
    # cells is off the table here, so the equivalent pressure comes from
    # biasing the slab START: ``occupied_bias`` of the updates draw the
    # start from a categorical over slab-aligned bins weighted by their
    # occupied-cell count (dense reduction, no scatter). Occupied regions
    # then refresh ~1/(1-bias) times faster than under uniform starts.
    start_u = jax.random.randint(k_cells, (), 0, total, jnp.int32)
    if occupied_bias > 0.0 and not warmup:
        bins = 256
        bin_size = -(-total // bins)
        padded = jnp.pad(density_grid, (0, bins * bin_size - total))
        occ_per_bin = jnp.sum(
            (padded > occupied_threshold).reshape(bins, bin_size), axis=1)
        logits = jnp.log(occ_per_bin.astype(jnp.float32) + 1e-3)
        chosen = jax.random.categorical(k_bin, logits)
        # a random offset within +-half a slab keeps bin edges covered
        jitter_c = jax.random.randint(k_bin, (), -(num_samples // 2),
                                      num_samples // 2 + 1, jnp.int32)
        start_b = (chosen.astype(jnp.int32) * bin_size + jitter_c) % total
        use_biased = jax.random.uniform(k_stream) < occupied_bias
        start = jnp.where(use_biased, start_b, start_u)
    else:
        start = start_u
    cells = (start + jnp.arange(num_samples, dtype=jnp.int32)) % total

    # Cell centers with intra-cell jitter.
    offsets = jax.random.uniform(k_jitter, (num_samples, 3))
    if position_fn is not None:
        # Multi-cascade grids: cell -> world position mapping supplied by
        # the caller (ops.occupancy.cascade_cell_positions).
        positions = position_fn(cells, offsets)
    else:
        z = cells % resolution
        y = (cells // resolution) % resolution
        x = cells // (resolution * resolution)
        coords = jnp.stack([x, y, z], -1).astype(jnp.float32) + offsets
        unit = coords / resolution
        positions = aabb_min + unit * (aabb_max - aabb_min)
    new_density = query_fn(positions)
    if carve_mask is not None:
        # Frustum-carved cells stay permanently empty (reference:
        # InstantNGP/Renderer.py:207-243 carve_occupancy_grid).
        rolled_mask = jnp.roll(carve_mask.astype(new_density.dtype), -start)
        new_density = new_density * rolled_mask[:num_samples]

    decayed = density_grid * decay
    rolled = jnp.roll(decayed, -start)
    rolled = jax.lax.dynamic_update_slice(
        rolled, jnp.maximum(rolled[:num_samples], new_density), (0,))
    return jnp.roll(rolled, start)


# ---------------------------------------------------------------------------
# Multi-cascade occupancy (unbounded scenes)
# ---------------------------------------------------------------------------

def downsample_occupancy_block(density_grid: jnp.ndarray, resolution: int,
                               march_resolution: int, threshold: float,
                               cap_blocks: int) -> jnp.ndarray:
    """Like downsample_occupancy, but emits the two-level rank-compacted
    block bitfield (ops/xbar_gather.py build_block_bitfield) whose probe
    cost is sub-linear in grid extent — the enabler for marching at the
    reference's full 128^3 skip-grid resolution
    (/root/reference/src/Methods/InstantNGP/Model.py:16)."""
    from nerficg_tpu.ops.xbar_gather import build_block_bitfield
    factor = resolution // march_resolution
    g = density_grid.reshape(march_resolution, factor, march_resolution,
                             factor, march_resolution, factor)
    coarse = g.max(axis=(1, 3, 5))
    return build_block_bitfield((coarse > threshold).reshape(-1),
                                march_resolution, cap_blocks)


def downsample_occupancy_cascaded_block(density_grid: jnp.ndarray,
                                        resolution: int,
                                        march_resolution: int,
                                        threshold: float, cascades: int,
                                        cap_blocks: int) -> jnp.ndarray:
    """(C*res^3,) density -> one packed two-level block bitfield covering
    all cascades (cascade = grid_index; rank space is shared, so the
    capacity pool is global across cascades)."""
    from nerficg_tpu.ops.xbar_gather import build_block_bitfield
    factor = resolution // march_resolution
    g = density_grid.reshape(cascades, march_resolution, factor,
                             march_resolution, factor,
                             march_resolution, factor)
    coarse = g.max(axis=(2, 4, 6)) > threshold            # (C, m, m, m)
    return build_block_bitfield(coarse.reshape(-1), march_resolution,
                                cap_blocks, num_grids=cascades)


def occupancy_probe_block_xyz(table: jnp.ndarray, ux: jnp.ndarray,
                              uy: jnp.ndarray, uz: jnp.ndarray,
                              resolution: int,
                              cap_blocks: int) -> jnp.ndarray:
    """Two-level block-bitfield probe from unit-coordinate planes."""
    from nerficg_tpu.ops.xbar_gather import block_probe_cells
    cx = jnp.clip((ux * resolution).astype(jnp.int32), 0, resolution - 1)
    cy = jnp.clip((uy * resolution).astype(jnp.int32), 0, resolution - 1)
    cz = jnp.clip((uz * resolution).astype(jnp.int32), 0, resolution - 1)
    return block_probe_cells(table, cx, cy, cz, 0, resolution, cap_blocks)


def _cascade_cell_coords(px, py, pz, center, max_half, resolution, cascades):
    """World planes -> (cascade, cx, cy, cz) int32 cell coords in the
    finest containing cascade (the NGP mip selection, raymarching.cu
    mip_from_pos)."""
    rx = px - center[0]
    ry = py - center[1]
    rz = pz - center[2]
    m = jnp.maximum(jnp.maximum(jnp.abs(rx), jnp.abs(ry)), jnp.abs(rz))
    base_half = max_half / (2 ** (cascades - 1))
    c = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(m / base_half, 1.0))
                          ).astype(jnp.int32), 0, cascades - 1)
    inv = 1.0 / (2.0 * base_half * jnp.exp2(c.astype(jnp.float32)))
    cx = jnp.clip(((rx * inv + 0.5) * resolution).astype(jnp.int32),
                  0, resolution - 1)
    cy = jnp.clip(((ry * inv + 0.5) * resolution).astype(jnp.int32),
                  0, resolution - 1)
    cz = jnp.clip(((rz * inv + 0.5) * resolution).astype(jnp.int32),
                  0, resolution - 1)
    return c, cx, cy, cz


def occupancy_probe_block_cascaded_xyz(table: jnp.ndarray, px: jnp.ndarray,
                                       py: jnp.ndarray, pz: jnp.ndarray,
                                       center: jnp.ndarray, max_half: float,
                                       resolution: int, cascades: int,
                                       cap_blocks: int) -> jnp.ndarray:
    """Cascaded two-level block-bitfield probe from world planes."""
    from nerficg_tpu.ops.xbar_gather import block_probe_cells
    c, cx, cy, cz = _cascade_cell_coords(px, py, pz, center, max_half,
                                         resolution, cascades)
    return block_probe_cells(table, cx, cy, cz, c, resolution, cap_blocks,
                             num_grids=cascades)


def num_cascades(scale: float) -> int:
    """cascades = max(1 + ceil(log2(2*scale)), 1)
    (reference: InstantNGP/Model.py:53)."""
    import math
    return max(1 + int(math.ceil(math.log2(max(2.0 * scale, 1e-6)))), 1)


def downsample_occupancy_cascaded(density_grid: jnp.ndarray, resolution: int,
                                  march_resolution: int, threshold: float,
                                  cascades: int) -> jnp.ndarray:
    """(C*res^3,) density -> (C, words, 128) bit-packed skip grids."""
    from nerficg_tpu.ops.xbar_gather import pack_bits
    factor = resolution // march_resolution
    g = density_grid.reshape(cascades, march_resolution, factor,
                             march_resolution, factor,
                             march_resolution, factor)
    coarse = g.max(axis=(2, 4, 6)) > threshold            # (C, m, m, m)
    return jnp.stack([pack_bits(coarse[c].reshape(-1))
                      for c in range(cascades)])


def cascade_of_positions(positions: jnp.ndarray, center: jnp.ndarray,
                         max_half: float, cascades: int) -> jnp.ndarray:
    """Finest cascade containing each position (..., 3) -> (...,) int32.

    Cascade c covers the box of half-extent max_half * 2^(c - (C-1));
    cascade C-1 is the full scene box (reference: the NGP mip selection in
    raymarching.cu, mip_from_pos)."""
    rel = jnp.abs(positions - center)
    m = jnp.max(rel, axis=-1)
    base_half = max_half / (2 ** (cascades - 1))
    c = jnp.ceil(jnp.log2(jnp.maximum(m / base_half, 1.0)))
    return jnp.clip(c.astype(jnp.int32), 0, cascades - 1)


def occupancy_probe_cascaded_xyz(packed: jnp.ndarray, px: jnp.ndarray,
                                 py: jnp.ndarray, pz: jnp.ndarray,
                                 center: jnp.ndarray, max_half: float,
                                 resolution: int) -> jnp.ndarray:
    """Cascaded bit-packed occupancy test from per-axis world-coordinate
    planes (the marcher's layout-friendly form; see occupancy_probe_xyz).

    packed: (C, words, 128) int32 from downsample_occupancy_cascaded.
    Each position is tested in its finest containing cascade."""
    from nerficg_tpu.ops.xbar_gather import xbar_gather
    cascades = packed.shape[0]
    rx = px - center[0]
    ry = py - center[1]
    rz = pz - center[2]
    m = jnp.maximum(jnp.maximum(jnp.abs(rx), jnp.abs(ry)), jnp.abs(rz))
    base_half = max_half / (2 ** (cascades - 1))
    c = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(m / base_half, 1.0))
                          ).astype(jnp.int32), 0, cascades - 1)
    inv = 1.0 / (2.0 * base_half * jnp.exp2(c.astype(jnp.float32)))
    cx = jnp.clip(((rx * inv + 0.5) * resolution).astype(jnp.int32),
                  0, resolution - 1)
    cy = jnp.clip(((ry * inv + 0.5) * resolution).astype(jnp.int32),
                  0, resolution - 1)
    cz = jnp.clip(((rz * inv + 0.5) * resolution).astype(jnp.int32),
                  0, resolution - 1)
    local = (cx * resolution + cy) * resolution + cz
    shape = local.shape
    local = local.reshape(-1)
    # pack_bits pads each cascade's bitfield to a multiple of 32*128 bits, so
    # the word offset of cascade c is c * words_per_cascade — NOT
    # (c * res^3) >> 5, which is only equal when res^3 divides 4096
    # (advisor finding, round 2).
    words_per_cascade = packed.shape[1] * 128
    word_idx = c.reshape(-1) * words_per_cascade + jnp.right_shift(local, 5)
    words = xbar_gather(packed.reshape(-1, 128), word_idx)
    bits = jnp.bitwise_and(
        jnp.right_shift(words, jnp.bitwise_and(local, 31)), 1)
    return (bits == 1).reshape(shape)


def occupancy_probe_cascaded(packed: jnp.ndarray, positions: jnp.ndarray,
                             center: jnp.ndarray, max_half: float,
                             resolution: int) -> jnp.ndarray:
    """Cascaded bit-packed occupancy test of world positions (..., 3)."""
    return occupancy_probe_cascaded_xyz(
        packed, positions[..., 0], positions[..., 1], positions[..., 2],
        center, max_half, resolution)


def cascade_cell_positions(cells: jnp.ndarray, offsets: jnp.ndarray,
                           center: jnp.ndarray, max_half: float,
                           resolution: int, cascades: int) -> jnp.ndarray:
    """Flat cascade-grid cell ids (+ intra-cell jitter in [0,1)^3) ->
    world positions; inverse of the cascaded probe indexing."""
    res3 = resolution ** 3
    c = cells // res3
    local = cells % res3
    z = local % resolution
    y = (local // resolution) % resolution
    x = local // (resolution * resolution)
    coords = jnp.stack([x, y, z], -1).astype(jnp.float32) + offsets
    unit = coords / resolution
    base_half = max_half / (2 ** (cascades - 1))
    half = base_half * jnp.exp2(c.astype(jnp.float32))
    return center + (unit - 0.5) * 2.0 * half[..., None]
