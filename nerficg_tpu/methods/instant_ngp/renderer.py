"""Instant-NGP renderer: occupancy-skipping marching + packed compositing.

Reference equivalent: src/Methods/InstantNGP/Renderer.py — ray-AABB clamp
(:39-43), one-shot packed training marcher (:61-83), iterative alive-ray
inference loop (:85-138), occupancy maintenance (:182-272).

TPU-first: both training and inference use the static-budget compacted
marcher (ops/occupancy.py); "dynamic batch" becomes a host-side choice among
a few pre-compiled bucket sizes. Occupancy updates are jitted grid refreshes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerficg_tpu.core.config import Configurable
from nerficg_tpu.data.types import RayBatch, View
from nerficg_tpu.methods.base.renderer import BaseRenderer
from nerficg_tpu.methods.instant_ngp.model import InstantNGPModel
from nerficg_tpu.ops.occupancy import (cascade_cell_positions,
                                       composite_packed,
                                       downsample_occupancy,
                                       downsample_occupancy_block,
                                       downsample_occupancy_cascaded,
                                       downsample_occupancy_cascaded_block,
                                       march_rays,
                                       occupancy_probe_block_cascaded_xyz,
                                       occupancy_probe_block_xyz,
                                       occupancy_probe_cascaded_xyz,
                                       update_density_grid)

__all__ = ['InstantNGPRenderer']


@Configurable.configure(
    MAX_SAMPLES=512,            # marching steps per ray (reference: 1024)
    MARCH_RESOLUTION=128,       # skip-grid probed by the marcher (reference
                                # density grid: 128^3, Model.py:16).
                                # DEFAULT by the round-5 march A/B
                                # (PERF_NOTES round-5): 128^3 @ 24 spr
                                # measures +0.92 dB over 64^3 @ 32 spr at
                                # the same total sample budget, for ~+33%
                                # step time (13.8 vs 10.4 ms at the 262k
                                # operating point). Set 64 (+32 spr) for
                                # the throughput point bench.py pins. The
                                # two-level 'block' probe is what makes
                                # 128^3 affordable at all (dense scan was
                                # a measured NET -37%, PERF_NOTES round 3).
    PROBE_MODE='block',         # 'block': two-level rank-compacted bitfield
                                # (ops/xbar_gather.py build_block_bitfield),
                                # probe cost ~ occupied volume (capped).
                                # 'dense': flat packed bitfield scan.
    PROBE_CAP_BLOCKS=0,         # 'block' capacity in 8^3-cell blocks; 0 =
                                # auto (total_blocks/4, min 256). Overflow
                                # blocks conservatively probe as occupied.
    AVG_SAMPLES_PER_RAY=24,     # training compaction budget = rays * this
                                # (24 pairs with the 128^3 default: the
                                # finer grid halves the occupied band, so
                                # the budget drops at BETTER quality —
                                # round-5 march A/B)
    INFERENCE_SAMPLES_PER_RAY=128,  # larger budget for full-image rendering
    MARCH_BLOCK=8,              # compaction granularity (steps per block):
                                # small blocks waste less budget on the thin
                                # occupied runs of surface-like scenes
    DENSITY_THRESHOLD=0.01,
    EARLY_STOP_EPS=1e-4,
    RAY_BATCH_SIZE=8192,
    OCCUPANCY_DECAY=0.95,
    OCCUPANCY_SAMPLES=262144,   # cells refreshed per update
    OCCUPANCY_OCCUPIED_BIAS=0.5,  # fraction of refreshes targeting occupied
                                  # regions (reference: Renderer.py:252-258
                                  # samples uniform + occupied cells)
    EXPONENTIAL_STEPS=None,     # None = auto (on for multi-cascade scenes);
                                # reference: Renderer.py:141-152
    CARVE_OCCUPANCY=True,       # frustum-carve the grid from training views
    # Progressive inference (the static-shape answer to the reference's
    # alive-ray loop, Renderer.py:85-138): render every ray at the base
    # budget, then re-march only the rays whose samples were truncated
    # while still transmissive, at REFINE_FACTOR x the budget.
    INFERENCE_REFINE=True,
    INFERENCE_REFINE_FRACTION=0.25,   # max refined rays per chunk
    INFERENCE_REFINE_FACTOR=4,
)
class InstantNGPRenderer(BaseRenderer):

    MODEL_CLASS = InstantNGPModel

    def __init__(self, config, model, mesh=None):
        super().__init__(config, model, mesh)
        self._render_jit = jax.jit(self._render_rays_impl,
                                   static_argnames=('randomized', 'num_rays'))
        self._render_infer_jit = jax.jit(
            partial(self._render_rays_impl,
                    samples_per_ray=int(self.INFERENCE_SAMPLES_PER_RAY)),
            static_argnames=('randomized', 'num_rays'))
        self._update_grid_jit = jax.jit(self._update_grid_impl,
                                        static_argnames=('warmup',))
        # Skip-grid resolution cannot exceed the density grid's.
        self._march_res = min(int(self.MARCH_RESOLUTION),
                              int(self.model.GRID_RESOLUTION))
        # Candidate probes per block, spaced so no cell crossing wider than
        # one probe gap is missed: gap (in steps) must not exceed the step
        # count a skip-grid cell spans (max_steps / (res * sqrt(3))).
        self._probes_per_block = max(2, int(np.ceil(
            int(self.MARCH_BLOCK) * self._march_res * (3.0 ** 0.5) /
            float(self.MAX_SAMPLES))))
        self._cascades = int(getattr(self.model, 'cascades', 1))
        exp = self.EXPONENTIAL_STEPS
        self._exponential = bool(self._cascades > 1 if exp is None else exp)
        self._probe_block = str(self.PROBE_MODE) == 'block'
        total_blocks = self._cascades * (self._march_res // 8) ** 3
        cap = int(self.PROBE_CAP_BLOCKS) or max(256, total_blocks // 4)
        self._cap_blocks = min(-(-cap // 8) * 8, total_blocks)
        if self._probe_block:
            if self._cascades > 1:
                self._grid_binary_jit = jax.jit(
                    lambda grid: downsample_occupancy_cascaded_block(
                        grid, int(self.model.GRID_RESOLUTION),
                        self._march_res, self.density_threshold,
                        self._cascades, self._cap_blocks))
            else:
                self._grid_binary_jit = jax.jit(
                    lambda grid: downsample_occupancy_block(
                        grid, int(self.model.GRID_RESOLUTION),
                        self._march_res, self.density_threshold,
                        self._cap_blocks))
        elif self._cascades > 1:
            self._grid_binary_jit = jax.jit(
                lambda grid: downsample_occupancy_cascaded(
                    grid, int(self.model.GRID_RESOLUTION), self._march_res,
                    self.density_threshold, self._cascades))
        else:
            self._grid_binary_jit = jax.jit(lambda grid: downsample_occupancy(
                grid, int(self.model.GRID_RESOLUTION), self._march_res,
                self.density_threshold))
        # Density scaled so a cell is "occupied" when alpha over one marching
        # step would be non-negligible (reference: Renderer.py:141-152).
        self._density_scale = float(self.MAX_SAMPLES) / (3.0 ** 0.5)

    @property
    def density_threshold(self) -> float:
        # alpha threshold -> density threshold given mean step length.
        extent = 2.0 * float(self.model.SCALE)  # static (config-derived)
        mean_step = extent * (3.0 ** 0.5) / float(self.MAX_SAMPLES)
        return float(self.DENSITY_THRESHOLD) / mean_step

    # -- core (pure, jitted) ------------------------------------------------------
    def _render_rays_impl(self, params: dict, grid_binary: jnp.ndarray,
                          origins: jnp.ndarray, directions: jnp.ndarray,
                          rng: jax.Array, background: jnp.ndarray,
                          randomized: bool = True,
                          num_rays: int | None = None,
                          samples_per_ray: int | None = None,
                          timestamps: jnp.ndarray | None = None) -> dict:
        n = origins.shape[0] if num_rays is None else num_rays
        budget = n * int(samples_per_ray if samples_per_ray is not None
                         else self.AVG_SAMPLES_PER_RAY)
        resolution = self._march_res if grid_binary.ndim >= 2 \
            else int(self.model.GRID_RESOLUTION)
        probe_fn = None
        if self._probe_block and grid_binary.ndim == 2:
            # Two-level block bitfield (single packed table, all cascades).
            # probe_fn takes per-axis world-coordinate planes (the marcher's
            # layout-friendly form; see ops/occupancy.py candidate pass).
            if self._cascades > 1:
                probe_fn = lambda px, py, pz: \
                    occupancy_probe_block_cascaded_xyz(
                        grid_binary, px, py, pz, self.model.center,
                        float(self.model.SCALE), resolution,
                        self._cascades, self._cap_blocks)
            else:
                amin, amax = self.model.aabb_min, self.model.aabb_max
                probe_fn = lambda px, py, pz: occupancy_probe_block_xyz(
                    grid_binary,
                    (px - amin[0]) / (amax[0] - amin[0]),
                    (py - amin[1]) / (amax[1] - amin[1]),
                    (pz - amin[2]) / (amax[2] - amin[2]),
                    resolution, self._cap_blocks)
        elif grid_binary.ndim == 3:    # (C, words, 128) cascaded bitfields
            probe_fn = lambda px, py, pz: occupancy_probe_cascaded_xyz(
                grid_binary, px, py, pz, self.model.center,
                float(self.model.SCALE), resolution)
        use_window = str(getattr(self.model, 'ENCODING_BACKEND', '')) \
            in ('window', 'cell')
        march = march_rays(
            origins, directions,
            self.model.aabb_min, self.model.aabb_max,
            grid_binary, resolution,
            max_steps=int(self.MAX_SAMPLES), sample_budget=budget,
            rng=rng if randomized else None, block=int(self.MARCH_BLOCK),
            exponential=self._exponential, probe_fn=probe_fn,
            morton=use_window, probes_per_block=self._probes_per_block)
        # Training steps (randomized) use the stochastic single-corner hash
        # encode; inference uses the exact 8-corner path (encode_seed=None).
        encode_seed = jax.random.randint(
            jax.random.fold_in(rng, 7), (1, 1), 0, 2**31 - 1, jnp.int32) \
            if randomized else None
        field_ids = march.ray_ids_m if use_window else march.ray_ids
        sample_times = None
        if timestamps is not None:
            # Per-sample timestamps: ids are block-constant, so gather the
            # owning ray's time once per block and broadcast (a sample-level
            # XLA gather measures 1.9 ms here; block-level + broadcast
            # 0.19 ms; the MXU factored gather 0.34 ms).
            block = int(self.MARCH_BLOCK)
            t_flat = jnp.pad(timestamps.reshape(-1), (0, 1))   # drop slot
            block_ids = jnp.minimum(field_ids.reshape(-1, block)[:, 0], n)
            sample_times = jnp.broadcast_to(
                t_flat[block_ids][:, None],
                (block_ids.shape[0], block)).reshape(-1)
        if use_window:
            # Gen-3 path: the marcher emitted a morton-ordered view of the
            # compacted blocks, so the windowed encode's per-sub-block table
            # windows stay tight (ops/hash_window.py); field outputs route
            # back to ray order via the differentiable block permutation.
            from nerficg_tpu.ops.sample_sort import permute_block_channels
            sigma_m, rgb_m = self._field(params, march.positions_m,
                                         march.directions_m, encode_seed,
                                         sample_times,
                                         anchor_keys=march.block_keys_m)
            ch = permute_block_channels(
                jnp.stack([sigma_m, rgb_m[:, 0], rgb_m[:, 1], rgb_m[:, 2]]),
                int(self.MARCH_BLOCK), march.perm_to_ray,
                march.perm_to_morton)
            sigma, rgb = ch[0], ch[1:4]      # rgb stays channel-major (3, B)
        else:
            sigma, rgb = self._field(params, march.positions,
                                     march.directions, encode_seed,
                                     sample_times)
        sigma = jnp.where(march.valid, sigma, 0.0)
        out = composite_packed(sigma, rgb, march, n, background=background,
                               early_stop_eps=float(self.EARLY_STOP_EPS),
                               block=int(self.MARCH_BLOCK))
        out['num_samples'] = march.num_valid
        out['num_blocks'] = march.num_blocks
        out['ray_mask'] = march.ray_complete[:, None].astype(jnp.float32)
        return out

    def _field(self, params, positions, directions, encode_seed,
               sample_times, anchor_keys=None):
        """Field-evaluation hook; dynamic methods override to consume the
        per-sample timestamps (methods/dnerf)."""
        del sample_times
        return self.model.field(params, positions, directions,
                                encode_seed=encode_seed,
                                anchor_keys=anchor_keys)

    def _update_grid_impl(self, params: dict, density_grid: jnp.ndarray,
                          rng: jax.Array, carve_mask=None,
                          warmup: bool = False) -> jnp.ndarray:
        # Stochastic encode is fine here: the grid is an EMA-max estimate and
        # the reference queries jittered positions anyway (Renderer.py:252).
        seed = jax.random.randint(jax.random.fold_in(rng, 11), (1, 1),
                                  0, 2**31 - 1, jnp.int32)

        def query(positions):
            sigma, _ = self.model.density(params, positions,
                                          encode_seed=seed)
            return sigma

        position_fn = None
        if self._cascades > 1:
            position_fn = lambda cells, offs: cascade_cell_positions(
                cells, offs, self.model.center, float(self.model.SCALE),
                int(self.model.GRID_RESOLUTION), self._cascades)
        return update_density_grid(
            density_grid, query, self.model.aabb_min, self.model.aabb_max,
            int(self.model.GRID_RESOLUTION), rng,
            num_samples=int(self.OCCUPANCY_SAMPLES),
            decay=float(self.OCCUPANCY_DECAY), warmup=warmup,
            position_fn=position_fn, carve_mask=carve_mask,
            occupied_bias=float(self.OCCUPANCY_OCCUPIED_BIAS),
            occupied_threshold=self.density_threshold)

    # -- public API ------------------------------------------------------------------
    def grid_binary(self) -> jnp.ndarray:
        """Coarse marching skip-grid as a bit-packed bitfield (see
        ops.occupancy.downsample_occupancy + ops.xbar_gather). Cached: the
        grid only changes on update_occupancy_grid, and recomputing it every
        step costs a dispatch."""
        grid = self.model.buffers['density_grid']
        # Key the cache on object IDENTITY while holding a reference to the
        # keyed array: a plain id() key can collide when CPython reuses a
        # freed array's address after two buffer swaps without an intervening
        # call (advisor finding, round 2).
        if getattr(self, '_grid_cache_src', None) is not grid:
            self._grid_binary_cache = self._grid_binary_jit(grid)
            self._grid_cache_src = grid
        return self._grid_binary_cache

    def update_occupancy_grid(self, rng: jax.Array, warmup: bool = False) -> None:
        """(reference: Renderer.py:245-272)"""
        self.model.buffers['density_grid'] = self._update_grid_jit(
            self.model.params, self.model.buffers['density_grid'], rng,
            self.model.buffers.get('carve_mask'), warmup=warmup)


    def occupied_cell_centers(self, max_points: int = 65536):
        """World-space centers of currently occupied occupancy cells —
        the data behind the wandb occupancy-grid 3D panel (reference:
        src/Methods/InstantNGP/utils.py:20-64)."""
        import numpy as np

        res = int(self.model.GRID_RESOLUTION)
        grid = np.asarray(self.model.buffers['density_grid'])
        occ = np.nonzero(grid > self.density_threshold)[0]
        if occ.size > max_points:
            occ = occ[np.random.default_rng(0).choice(occ.size, max_points,
                                                      replace=False)]
        cells = jnp.asarray(occ, jnp.int32)
        centers = cascade_cell_positions(
            cells, jnp.full((cells.shape[0], 3), 0.5), self.model.center,
            float(self.model.SCALE), res, self._cascades)
        return np.asarray(centers)

    def carve_occupancy_grid(self, views, dilate: int = 1) -> None:
        """Frustum carving: cells outside every training camera frustum are
        marked permanently empty (reference: InstantNGP/Renderer.py:207-243,
        carve_occupancy_grid with 2D+3D dilation).

        All views that share a camera are projected in ONE jitted dispatch
        over stacked world-to-cam matrices: a per-view eager projection costs
        ~6 host<->device round trips per view, and on the tunneled TPU that
        dispatch latency dominated whole quality runs (129-1600 s for 30
        views, round-5 timings.txt) against ~1 s of actual compute.

        Stores a {0,1} mask buffer consumed by the occupancy updates."""
        import numpy as np

        res = int(self.model.GRID_RESOLUTION)
        cascades = self._cascades
        total = cascades * res ** 3
        cells = jnp.arange(total, dtype=jnp.int32)
        centers = cascade_cell_positions(
            cells, jnp.full((total, 3), 0.5), self.model.center,
            float(self.model.SCALE), res, cascades)          # (N, 3) device

        def batch_visible(camera, margin):
            def fn(centers_dev, w2c):
                pts = jnp.einsum('nj,cij->cni', centers_dev,
                                 w2c[:, :3, :3]) + w2c[:, None, :3, 3]
                pix = camera.cam_to_screen(pts)              # (C, N, 3)
                w, h = camera.width, camera.height
                inside = (pix[..., 2] > 0) & \
                    (pix[..., 0] > -margin) & (pix[..., 0] < w + margin) & \
                    (pix[..., 1] > -margin) & (pix[..., 1] < h + margin)
                return jnp.any(inside, axis=0)               # (N,)
            return jax.jit(fn)

        groups: dict = {}
        for view in views:
            groups.setdefault(id(view.camera), (view.camera, []))[1].append(
                view)
        visible = np.zeros(total, bool)
        for camera, group in groups.values():
            margin = 0.1 * max(camera.width, camera.height)
            fn = batch_visible(camera, margin)
            # Chunk views so the (C, N, 3) staging buffer stays bounded
            # (res 128, cascades>1 scenes reach N ~ 10M cells).
            chunk = max(1, min(len(group),
                               int(2e8) // max(total, 1)))
            for i in range(0, len(group), chunk):
                w2c = jnp.asarray(np.stack(
                    [v.w2c for v in group[i:i + chunk]]), jnp.float32)
                visible |= np.asarray(fn(centers, w2c))
        mask = visible.reshape(cascades, res, res, res).astype(np.float32)
        # Conservative 3D dilation by ``dilate`` cells (6-neighborhood);
        # numpy: the mask is small and host-side rolls avoid 12 more
        # eager device dispatches per dilation step.
        for _ in range(max(dilate, 0)):
            m = mask
            for axis in (1, 2, 3):
                m = np.maximum(m, np.roll(mask, 1, axis))
                m = np.maximum(m, np.roll(mask, -1, axis))
            mask = m
        self.model.buffers['carve_mask'] = jnp.asarray(mask.reshape(-1))
        frac = float(mask.mean())
        from nerficg_tpu.core.logging import Logger
        Logger.verbose(f'occupancy carve: {frac * 100:.1f}% of cells visible')


    def _refine_impl(self, params, grid_binary, origins, directions, rng,
                     background, out, timestamps=None):
        """Second marching pass for truncated-but-transmissive rays
        (static-shape alive-ray equivalent, reference Renderer.py:85-138).
        Selects up to a fixed fraction of the chunk and re-renders them at
        a larger per-ray budget, merging results back."""
        chunk = origins.shape[0]
        r2 = max(int(chunk * float(self.INFERENCE_REFINE_FRACTION)), 128)
        unfinished = (out['ray_mask'][:, 0] < 0.5) & \
            (out['alpha'][:, 0] < 0.995)
        (ids,) = jnp.nonzero(unfinished, size=r2, fill_value=chunk)
        valid = (ids < chunk)[:, None]
        safe = jnp.minimum(ids, chunk - 1)
        ts2 = timestamps[safe] if timestamps is not None else None
        out2 = self._render_rays_impl(
            params, grid_binary, origins[safe], directions[safe], rng,
            background, randomized=False, num_rays=r2,
            samples_per_ray=int(self.INFERENCE_SAMPLES_PER_RAY) *
            int(self.INFERENCE_REFINE_FACTOR), timestamps=ts2)
        merged = dict(out)
        for key in ('rgb', 'depth', 'alpha'):
            repl = jnp.where(valid, out2[key], out[key][safe])
            merged[key] = out[key].at[safe].set(repl)
        return merged

    def render_rays(self, rays: RayBatch, rng: Optional[jax.Array] = None,
                    randomized: bool = False,
                    background: Optional[jnp.ndarray] = None) -> dict:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        # Inference uses a larger per-ray sample budget than training: budget
        # truncation would otherwise blank rays at the end of each chunk.
        chunk = max((int(self.RAY_BATCH_SIZE) * int(self.AVG_SAMPLES_PER_RAY))
                    // int(self.INFERENCE_SAMPLES_PER_RAY), 256)
        bg = jnp.asarray(
            background if background is not None else
            getattr(self, '_background', jnp.zeros(3)), jnp.float32)
        grid = self.grid_binary()
        n = len(rays)
        padded = ((n + chunk - 1) // chunk) * chunk
        rays_p = rays.pad_to(padded)
        outputs = []
        for i in range(0, padded, chunk):
            ts_chunk = rays_p.timestamps[i:i + chunk] \
                if rays_p.timestamps is not None else None
            out = self._render_infer_jit(self.model.params, grid,
                                         rays_p.origins[i:i + chunk],
                                         rays_p.directions[i:i + chunk],
                                         jax.random.fold_in(rng, i), bg,
                                         randomized=randomized,
                                         timestamps=ts_chunk)
            if bool(self.INFERENCE_REFINE):
                if not hasattr(self, '_refine_jit'):
                    self._refine_jit = jax.jit(self._refine_impl)
                out = self._refine_jit(self.model.params, grid,
                                       rays_p.origins[i:i + chunk],
                                       rays_p.directions[i:i + chunk],
                                       jax.random.fold_in(rng, i + 1), bg,
                                       out, timestamps=ts_chunk)
            outputs.append({k: v for k, v in out.items()
                            if k in ('rgb', 'depth', 'alpha')})
        return {k: jnp.concatenate([o[k] for o in outputs], axis=0)[:n]
                for k in outputs[0]}

    def bind_background(self, background) -> None:
        self._background = jnp.asarray(background, jnp.float32)

    def render_image(self, view: View, rng: Optional[jax.Array] = None,
                     benchmark: bool = False) -> dict[str, jnp.ndarray]:
        self.bind_background(view.camera.background_color)
        rays = view.get_rays(with_images=False)
        out = self.render_rays(rays, rng=rng, randomized=False)
        h, w = view.camera.height, view.camera.width
        result = {'rgb': out['rgb'].reshape(h, w, 3),
                  'depth': out['depth'].reshape(h, w, 1),
                  'alpha': out['alpha'].reshape(h, w, 1)}
        if benchmark:
            from nerficg_tpu.core.setup import device_sync
            device_sync(result['rgb'])
        return result
