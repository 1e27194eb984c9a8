"""Instant-NGP trainer: fused Adam, step LR, dynamic ray batching, occupancy.

Reference equivalent: src/Methods/InstantNGP/Trainer.py:15-120 — Adam with
eps 1e-15 (:33-38), MultiStepLR x0.33 from 20k every 10k (:39-43), dynamic
ray-batch sizing toward TARGET_BATCH_SIZE=262144 samples/step (:73-78,96),
occupancy updates every 16 iters with 256-step warmup (:66-70), random
background per batch (:87); loss = MSE + 5e-7 MLP weight decay (Loss.py:12-26).

TPU-first: "dynamic batch size" can't change compiled shapes, so the trainer
snaps the desired ray count to a small set of power-of-two buckets — one
compiled executable per bucket, reused for the whole run. The occupancy
update and train step are separate jitted functions scheduled by callbacks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerficg_tpu.core.config import Configurable
from nerficg_tpu.core.logging import Logger
from nerficg_tpu.methods.base.callbacks import (pre_training_callback,
                                                training_callback)
from nerficg_tpu.methods.base.trainer import BaseTrainer
from nerficg_tpu.optim.lr import multistep_lr
from nerficg_tpu.optim.metrics import mse_to_psnr

__all__ = ['InstantNGPTrainer']


@Configurable.configure(
    NUM_ITERATIONS=50000,
    TARGET_BATCH_SIZE=262144,     # samples per step (reference: Trainer.py:17)
    INITIAL_RAYS_PER_BATCH=4096,
    MAX_RAYS_PER_BATCH=65536,
    LR=1e-2,
    LR_MILESTONES=[20000, 30000, 40000],
    LR_GAMMA=0.33,
    WEIGHT_DECAY=5e-7,
    OCCUPANCY_UPDATE_INTERVAL=16,
    OCCUPANCY_WARMUP_STEPS=256,
    RANDOM_BACKGROUND=True,
    BATCH_RESIZE_INTERVAL=16,
    # Steps fused into one dispatch via lax.scan: host-loop + dispatch
    # overhead through the tunnel is ~5-8 ms/step (PERF_NOTES.md), so
    # batching K steps amortizes it K-fold. The occupancy grid is
    # refreshed between dispatches (OCCUPANCY_UPDATE_INTERVAL should be a
    # multiple of this).
    SCAN_STEPS=1,
    LOG_INTERVAL=1000,
)
class InstantNGPTrainer(BaseTrainer):

    def __init__(self, config, model, renderer):
        super().__init__(config, model, renderer)
        schedule = multistep_lr(float(self.LR), list(self.LR_MILESTONES),
                                float(self.LR_GAMMA))
        self.optimizer = optax.adam(learning_rate=schedule, eps=1e-15)
        self.opt_state = None
        self._pool = None
        self._train_steps: dict[int, callable] = {}   # bucket -> compiled fn
        self.rays_per_batch = int(self.INITIAL_RAYS_PER_BATCH)
        self._measured_samples: list[float] = []
        self._measured_mask_frac: list[float] = []
        self._measured_blocks: list[float] = []

    def get_optimizer_state(self):
        return self.opt_state if self.opt_state is not None else {}

    def set_optimizer_state(self, state) -> None:
        if state:
            template = self.optimizer.init(self.model.params)
            treedef = jax.tree_util.tree_structure(template)
            self.opt_state = jax.tree_util.tree_unflatten(
                treedef, jax.tree_util.tree_leaves(state))

    def on_resume(self, dataset) -> None:
        """Rebuild the ray pool / background / rng; trained params, occupancy
        buffers and optimizer state come from the resume file."""
        self._init_samplers(dataset)

    def get_resume_metadata(self) -> dict:
        return {'rays_per_batch': int(self.rays_per_batch)}

    def set_resume_metadata(self, meta: dict) -> None:
        if 'rays_per_batch' in meta:
            self.rays_per_batch = int(meta['rays_per_batch'])

    # -- setup ------------------------------------------------------------------------
    @pre_training_callback(priority=4000)
    def _init_samplers(self, dataset) -> None:
        collection = dataset.precompute_rays('train')
        rays = collection.rays
        self._pool = {
            'origins': jnp.asarray(rays.origins),
            'directions': jnp.asarray(rays.directions),
            'rgb': jnp.asarray(rays.rgb) if rays.rgb is not None else None,
            'alpha': jnp.asarray(rays.alpha) if rays.alpha is not None else None,
            'timestamps': jnp.asarray(rays.timestamps)
            if rays.timestamps is not None else None,
        }
        self._pool_size = int(self._pool['origins'].shape[0])
        seed = int(self._config.get_path('GLOBAL.RANDOM_SEED', 42)) \
            if self._config is not None else 42
        self._np_rng = np.random.default_rng(seed)
        self._bg_static = jnp.asarray(dataset.camera_settings.background_color,
                                      jnp.float32)
        self.renderer.bind_background(self._bg_static)
        if self.opt_state is None:
            self.opt_state = self.optimizer.init(self.model.params)

    @pre_training_callback(priority=3500)
    def _carve_occupancy(self, dataset) -> None:
        """Frustum-carve the grid from the training views before the warmup
        refresh (reference: InstantNGP/Renderer.py:207-243)."""
        if dataset is not None and bool(self.renderer.CARVE_OCCUPANCY):
            views = dataset.train().views
            if views:
                self.renderer.carve_occupancy_grid(views)

    @pre_training_callback(priority=3000)
    def _warmup_occupancy(self, dataset) -> None:
        """Full-grid refresh before training (reference warmup at :66-70)."""
        self.renderer.update_occupancy_grid(self.next_rng(), warmup=True)

    # -- train step construction per bucket ------------------------------------------
    def _num_devices(self) -> int:
        import jax as _jax
        configured = self._config.get_path('GLOBAL.NUM_DEVICES') \
            if self._config is not None else None
        available = len(_jax.devices())
        return min(int(configured), available) if configured else available

    def _loss_extras(self, params, rng):
        """Method-specific auxiliary loss terms, added to the color loss
        inside the jitted step (hook; DNeRF adds a deformation-offset
        prior). Returns (scalar term, logs dict)."""
        return jnp.zeros(()), {}

    def _get_train_step(self, num_rays: int):
        if num_rays in self._train_steps:
            return self._train_steps[num_rays]
        if self._num_devices() > 1:
            step = self._build_dp_train_step(num_rays)
            self._train_steps[num_rays] = step
            return step
        renderer = self.renderer
        optimizer = self.optimizer
        weight_decay = float(self.WEIGHT_DECAY)
        has_alpha = self._pool['alpha'] is not None
        has_time = self._pool.get('timestamps') is not None
        # The TOTAL sample budget stays at TARGET_BATCH_SIZE regardless of the
        # ray count (mirrors the reference's global sample counter semantics,
        # InstantNGP/Trainer.py:73-78): fewer rays -> more samples per ray.
        samples_per_ray = min(
            max(int(self.TARGET_BATCH_SIZE) // num_rays, 4),
            int(renderer.MAX_SAMPLES))

        def one_step(params, opt_state, grid_binary, pool, ids, rng, bg):
            origins = pool['origins'][ids]
            directions = pool['directions'][ids]
            target = pool['rgb'][ids]
            times = pool['timestamps'][ids] if has_time else None
            if has_alpha:
                alpha = pool['alpha'][ids]
                target = target * alpha + bg * (1.0 - alpha)

            def loss_fn(p):
                out = renderer._render_rays_impl(
                    p, grid_binary, origins, directions, rng, bg,
                    randomized=True, num_rays=num_rays,
                    samples_per_ray=samples_per_ray, timestamps=times)
                # Exclude rays whose samples were truncated by the compaction
                # budget — they would otherwise train toward black.
                mask = out['ray_mask']
                err = (out['rgb'] - target) ** 2 * mask
                color = jnp.sum(err) / jnp.maximum(jnp.sum(mask) * 3.0, 1.0)
                wd = renderer.model.mlp_weight_squares(p)
                extra, extra_logs = self._loss_extras(p, rng)
                loss = color + weight_decay * wd + extra
                logs = {'color': color, 'weight_decay': wd,
                        'total': loss,
                        'psnr': mse_to_psnr(color),
                        'num_samples': out['num_samples'],
                        'num_blocks': out['num_blocks'],
                        'ray_mask_frac': jnp.mean(mask)}
                logs.update(extra_logs)
                return loss, logs

            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, logs

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, grid_binary, pool, ids, rng, bg):
            # Single step (ids (n,)) or a scanned batch (ids (k, n) with
            # per-step rngs (k, 2) and backgrounds (k, 3)).
            if ids.ndim == 1:
                return one_step(params, opt_state, grid_binary, pool, ids,
                                rng, bg)

            def body(carry, xs):
                p, o = carry
                step_ids, step_rng, step_bg = xs
                p, o, logs = one_step(p, o, grid_binary, pool, step_ids,
                                      step_rng, step_bg)
                return (p, o), logs

            (params, opt_state), logs = jax.lax.scan(
                body, (params, opt_state), (ids, rng, bg))
            last = jax.tree_util.tree_map(lambda x: x[-1], logs)
            # Means over the scan window feed the batch resizer.
            last['num_samples'] = jnp.mean(logs['num_samples'].astype(
                jnp.float32))
            last['num_blocks'] = jnp.mean(logs['num_blocks'].astype(
                jnp.float32))
            last['ray_mask_frac'] = jnp.mean(logs['ray_mask_frac'])
            return params, opt_state, last

        self._train_steps[num_rays] = train_step
        return train_step

    def _build_dp_train_step(self, num_rays: int):
        """Data-parallel step: rays sharded over the mesh, params replicated,
        grads pmean'd (see parallel/data_parallel.py). The returned callable
        has the same signature as the single-device step."""
        from nerficg_tpu.parallel.data_parallel import (
            make_data_parallel_train_step, replicate)
        from nerficg_tpu.parallel.mesh import make_mesh
        n_dev = self._num_devices()
        assert num_rays % n_dev == 0, \
            f'rays/batch {num_rays} must divide over {n_dev} devices'
        local_rays = num_rays // n_dev
        mesh = make_mesh(num_devices=n_dev)
        renderer = self.renderer
        weight_decay = float(self.WEIGHT_DECAY)
        has_alpha = self._pool['alpha'] is not None
        has_time = self._pool.get('timestamps') is not None
        samples_per_ray = min(
            max(int(self.TARGET_BATCH_SIZE) // num_rays, 4),
            int(renderer.MAX_SAMPLES))

        def grad_fn(params, batch, rng):
            pool = batch['pool']        # replicated via leading length-1 axis
            ids = batch['ids']
            origins = pool['origins'][0][ids]
            directions = pool['directions'][0][ids]
            target = pool['rgb'][0][ids]
            bg = batch['bg'][0]
            times = pool['timestamps'][0][ids] if has_time else None
            if has_alpha:
                alpha = pool['alpha'][0][ids]
                target = target * alpha + bg * (1.0 - alpha)

            def loss_fn(p):
                out = renderer._render_rays_impl(
                    p, batch['grid'][0], origins, directions, rng, bg,
                    randomized=True, num_rays=local_rays,
                    samples_per_ray=samples_per_ray, timestamps=times)
                mask = out['ray_mask']
                err = (out['rgb'] - target) ** 2 * mask
                color = jnp.sum(err) / jnp.maximum(jnp.sum(mask) * 3.0, 1.0)
                wd = renderer.model.mlp_weight_squares(p)
                extra, extra_logs = self._loss_extras(p, rng)
                loss = color + weight_decay * wd + extra
                logs = {'color': color, 'weight_decay': wd,
                        'total': loss, 'psnr': mse_to_psnr(color),
                        'num_samples': out['num_samples'],
                        'num_blocks': out['num_blocks'],
                        'ray_mask_frac': jnp.mean(mask)}
                logs.update(extra_logs)
                return loss, logs

            return jax.value_and_grad(loss_fn, has_aux=True)(params)

        dp_step = make_data_parallel_train_step(mesh, grad_fn, self.optimizer)
        n_devices = n_dev

        def step(params, opt_state, grid_binary, pool, ids, rng, bg):
            batch = {
                'ids': ids,
                # Broadcast replicated operands with a leading device axis so
                # shard_map's P('data') spec slices one copy per device.
                'pool': {k: (jnp.broadcast_to(v[None], (n_devices,) + v.shape)
                             if v is not None else None)
                         for k, v in pool.items()},
                'grid': jnp.broadcast_to(grid_binary[None],
                                         (n_devices,) + grid_binary.shape),
                'bg': jnp.broadcast_to(bg[None], (n_devices,) + bg.shape),
            }
            return dp_step(params, opt_state, batch, rng)

        return step

    # -- callbacks ---------------------------------------------------------------------
    @training_callback(priority=200, iteration_stride='OCCUPANCY_UPDATE_INTERVAL')
    def _update_occupancy(self, dataset, iteration: int) -> None:
        warmup = iteration < int(self.OCCUPANCY_WARMUP_STEPS)
        self.renderer.update_occupancy_grid(self.next_rng(), warmup=warmup)

    @training_callback(priority=100)
    def training_iteration(self, dataset, iteration: int) -> None:
        # K = SCAN_STEPS iterations are fused into one scanned dispatch; the
        # callback fires every iteration but only dispatches on window
        # boundaries (the iteration counter still advances one by one so
        # checkpoint/backup/occupancy schedules keep their semantics,
        # quantized to the window).
        k = max(int(self.SCAN_STEPS), 1)
        if k > 1 and self._num_devices() == 1:
            if iteration % k != 0:
                return
            n = self.rays_per_batch
            ids = jnp.asarray(
                self._np_rng.integers(0, self._pool_size, size=(k, n)),
                jnp.int32)
            if bool(self.RANDOM_BACKGROUND):
                bg = jnp.asarray(self._np_rng.random((k, 3)), jnp.float32)
            else:
                bg = jnp.broadcast_to(self._bg_static, (k, 3))
            rngs = jax.random.split(self.next_rng(), k)
            step = self._get_train_step(n)
            self.model.params, self.opt_state, logs = step(
                self.model.params, self.opt_state,
                self.renderer.grid_binary(), self._pool, ids, rngs, bg)
            self._last_logs = logs
            self._measured_samples.append(logs['num_samples'])
            self._measured_mask_frac.append(logs['ray_mask_frac'])
            self._measured_blocks.append(logs['num_blocks'])
            return
        n = self.rays_per_batch
        ids = jnp.asarray(self._np_rng.integers(0, self._pool_size, size=n),
                          jnp.int32)
        if bool(self.RANDOM_BACKGROUND):
            bg = jnp.asarray(self._np_rng.random(3), jnp.float32)
        else:
            bg = self._bg_static
        step = self._get_train_step(n)
        self.model.params, self.opt_state, logs = step(
            self.model.params, self.opt_state, self.renderer.grid_binary(),
            self._pool, ids, self.next_rng(), bg)
        self._last_logs = logs
        # Keep device scalars — a float() here would force a device sync
        # every step and halve throughput (fetched in _resize_batch).
        self._measured_samples.append(logs['num_samples'])
        self._measured_mask_frac.append(logs['ray_mask_frac'])
        self._measured_blocks.append(logs.get('num_blocks',
                                              logs['num_samples']))

    @training_callback(priority=90, iteration_stride='BATCH_RESIZE_INTERVAL',
                       start_iteration='BATCH_RESIZE_INTERVAL')
    def _resize_batch(self, dataset, iteration: int) -> None:
        """Dynamic ray count toward TARGET_BATCH_SIZE samples, snapped to
        power-of-two buckets (reference: Trainer.py:73-78). The total sample
        budget is fixed, so the signal is ray completeness: shrink the batch
        when rays overflow their per-ray share, grow when there is headroom."""
        if not self._measured_samples:
            return
        # Pipelined statistics fetch: a synchronous device->host round trip
        # costs ~27 ms through the tunnel (PERF_NOTES.md), so we start an
        # async copy of this interval's stats and make the resize decision on
        # the PREVIOUS interval's (already-landed) values — one interval of
        # lag, zero stalls.
        # One jitted dispatch for the whole reduction: the eager form
        # (3x stack + 3x mean) cost ~7 tunnel round trips = ~250 ms per
        # resize, ~47 s per 3000-iter run (round-5 timings.txt).
        if not hasattr(self, '_stats_jit'):
            def _stats(samples, mask, blocks):
                return jnp.stack([
                    jnp.mean(jnp.asarray(samples, jnp.float32)),
                    jnp.mean(jnp.asarray(mask, jnp.float32)),
                    jnp.mean(jnp.asarray(blocks, jnp.float32))])
            self._stats_jit = jax.jit(_stats)
        stats = self._stats_jit(
            tuple(self._measured_samples),
            tuple(self._measured_mask_frac) if self._measured_mask_frac
            else (jnp.ones(()),),
            tuple(self._measured_blocks))
        if jax.default_backend() == 'tpu':
            try:
                stats.copy_to_host_async()
            except AttributeError:
                pass
        prev = getattr(self, '_pending_stats', None)
        self._pending_stats = (stats, self.rays_per_batch)
        self._measured_samples.clear()
        self._measured_mask_frac.clear()
        self._measured_blocks.clear()
        if prev is None:
            return
        prev_stats, prev_rays = prev
        n = self.rays_per_batch
        if prev_rays != n:
            return                    # stats are from a different bucket
        prev_stats = np.asarray(prev_stats)
        mean_blocks = max(float(prev_stats[2]), 1.0)
        mask_frac = float(prev_stats[1])
        # Aim the batch at full budget utilization (the reference adjusts
        # rays/batch = target_samples / measured_samples_per_ray,
        # InstantNGP/Trainer.py:73-78; here the budget is consumed at block
        # granularity, so the signal is occupied blocks per ray).
        budget_blocks = (int(self.TARGET_BATCH_SIZE)
                         // int(self.renderer.MARCH_BLOCK))
        blocks_per_ray = mean_blocks / n
        desired = budget_blocks / blocks_per_ray
        bucket = 1 << int(np.round(np.log2(max(desired, 256))))
        bucket = int(np.clip(bucket, 256, int(self.MAX_RAYS_PER_BATCH)))
        if bucket != n:
            Logger.verbose(f'iter {iteration}: rays/batch {n} -> {bucket} '
                           f'(mask {mask_frac:.3f}, '
                           f'{blocks_per_ray:.1f} blocks/ray)')
            self.rays_per_batch = bucket

    @training_callback(priority=45, iteration_stride='LOG_INTERVAL',
                       start_iteration='LOG_INTERVAL')
    def _wandb_log_occupancy(self, dataset, iteration: int) -> None:
        """Occupancy-grid 3D panel + occupied-cell count (reference:
        src/Methods/InstantNGP/utils.py:20-64 logs the grid as a wandb
        Object3D point cloud)."""
        wb = getattr(self, '_wandb', None)
        if wb is None or not wb.active:
            return
        centers = self.renderer.occupied_cell_centers()
        wb.log({'occupancy/occupied_cells': int(centers.shape[0])},
               step=iteration)
        if centers.shape[0]:
            wb.log_point_cloud('occupancy/grid', centers, step=iteration)

    @training_callback(priority=50, iteration_stride='LOG_INTERVAL')
    def _log_progress(self, dataset, iteration: int) -> None:
        logs = getattr(self, '_last_logs', None)
        if logs is not None:
            Logger.verbose(
                f'iter {iteration}: ' +
                ', '.join(f'{k}={float(v):.4f}' for k, v in logs.items()))

