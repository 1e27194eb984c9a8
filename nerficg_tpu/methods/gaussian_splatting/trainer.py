"""Gaussian Splatting trainer: L1+DSSIM loss, densification schedule.

Reference equivalent: src/Methods/GaussianSplatting/Trainer.py:18-150 —
camera-extent estimate (1.1x max radius), point cloud init (or 100k random
points in the bbox), per-iteration full-image render of a random train view
with 0.8 L1 + 0.2 DSSIM loss, densify every 100 iters in [500, 15000],
opacity reset every 3000, SH degree +1 per 1000 iters, post-training bake;
per-group learning rates with the position LR scaled by camera extent and
log-lerp decayed (src/Methods/GaussianSplatting/Model.py:121-150).

TPU-first: the jitted train step renders one full image and returns grads;
densification runs host-side between steps via optimizer-state surgery
(capacity buckets keep recompiles rare).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerficg_tpu.core.config import Configurable
from nerficg_tpu.core.logging import Logger
from nerficg_tpu.data.types import BasicPointCloud
from nerficg_tpu.methods.base.callbacks import (post_training_callback,
                                                pre_training_callback,
                                                training_callback)
from nerficg_tpu.methods.base.trainer import BaseTrainer
from nerficg_tpu.optim.losses import dssim as dssim_fn
from nerficg_tpu.optim.lr import lr_decay_policy
from nerficg_tpu.optim.metrics import mse_to_psnr

__all__ = ['GaussianSplattingTrainer']


@Configurable.configure(
    NUM_ITERATIONS=30000,
    LAMBDA_DSSIM=0.2,
    POSITION_LR_INIT=1.6e-4,      # x camera extent (reference: Model.py:121-150)
    POSITION_LR_FINAL=1.6e-6,
    FEATURE_LR=2.5e-3,
    OPACITY_LR=0.025,
    SCALING_LR=5e-3,
    ROTATION_LR=1e-3,
    DENSIFY_FROM=500,
    DENSIFY_UNTIL=15000,
    DENSIFY_INTERVAL=100,
    DENSIFY_GRAD_THRESHOLD=2e-4,
    OPACITY_RESET_INTERVAL=3000,
    PERCENT_DENSE=0.01,
    MIN_OPACITY=0.005,
    SH_UPDATE_INTERVAL=1000,
    RANDOM_POINTS=100000,
    LOG_INTERVAL=500,
)
class GaussianSplattingTrainer(BaseTrainer):

    def __init__(self, config, model, renderer):
        super().__init__(config, model, renderer)
        self.optimizer = None
        self.opt_state = None
        self.camera_extent = 1.0
        self._train_step_cache = {}
        self._grad_accum = None
        self._grad_count = None
        self._max_radii = None

    def get_optimizer_state(self):
        return self.opt_state if self.opt_state is not None else {}

    def set_optimizer_state(self, state) -> None:
        if state and self.optimizer is not None:
            template = self.optimizer.init(self.model.params)
            treedef = jax.tree_util.tree_structure(template)
            self.opt_state = jax.tree_util.tree_unflatten(
                treedef, jax.tree_util.tree_leaves(state))

    # -- setup ------------------------------------------------------------------------
    @pre_training_callback(priority=4500)
    def _setup_gaussians(self, dataset) -> None:
        """(reference: Trainer.py:57-68)"""
        positions = np.stack([v.position for v in dataset.subsets['train']])
        center = positions.mean(0)
        self.camera_extent = 1.1 * float(
            np.linalg.norm(positions - center, axis=-1).max()) or 1.0
        pcd = dataset.point_cloud
        if pcd is None or len(pcd) == 0:
            rng_np = np.random.default_rng(0)
            bbox = dataset.bounding_box
            lo, hi = bbox.min, bbox.max
            pts = rng_np.random((int(self.RANDOM_POINTS), 3)) * (hi - lo) + lo
            pcd = BasicPointCloud(pts.astype(np.float32),
                                  rng_np.random((int(self.RANDOM_POINTS), 3))
                                  .astype(np.float32))
            Logger.info(f'GS init from {len(pcd)} random points in bbox')
        self.model.init_from_point_cloud(pcd)
        self.model.active_sh_degree = 1
        self._build_optimizer()
        self._reset_densify_stats()
        self._np_rng = np.random.default_rng(
            int(self._config.get_path('GLOBAL.RANDOM_SEED', 42))
            if self._config is not None else 42)

    def on_resume(self, dataset) -> None:
        """Rebuild the optimizer / densify stats / rng around the restored
        params WITHOUT re-initializing from the point cloud."""
        positions = np.stack([v.position for v in dataset.subsets['train']])
        center = positions.mean(0)
        self.camera_extent = 1.1 * float(
            np.linalg.norm(positions - center, axis=-1).max()) or 1.0
        self._build_optimizer()
        self._reset_densify_stats()
        self._np_rng = np.random.default_rng(
            int(self._config.get_path('GLOBAL.RANDOM_SEED', 42))
            if self._config is not None else 42)

    def get_resume_metadata(self) -> dict:
        return {'num_active': int(self.model.num_active),
                'active_sh_degree': int(self.model.active_sh_degree)}

    def set_resume_metadata(self, meta: dict) -> None:
        if 'num_active' in meta:
            self.model.num_active = int(meta['num_active'])
        if 'active_sh_degree' in meta:
            self.model.active_sh_degree = int(meta['active_sh_degree'])

    def _build_optimizer(self) -> None:
        """Per-group LRs; position LR scaled by camera extent and log-lerp
        decayed (reference: Model.py:121-150)."""
        pos_schedule = lr_decay_policy(
            float(self.POSITION_LR_INIT) * self.camera_extent,
            float(self.POSITION_LR_FINAL) * self.camera_extent,
            int(self.NUM_ITERATIONS))
        lrs = {
            'positions': pos_schedule,
            'features_dc': float(self.FEATURE_LR),
            'features_rest': float(self.FEATURE_LR) / 20.0,
            'opacities': float(self.OPACITY_LR),
            'scales': float(self.SCALING_LR),
            'rotations': float(self.ROTATION_LR),
        }
        label_fn = None
        self.optimizer = optax.multi_transform(
            {key: optax.adam(lr, eps=1e-15) for key, lr in lrs.items()},
            param_labels={key: key for key in lrs})
        self.opt_state = self.optimizer.init(self.model.params)

    def _reset_densify_stats(self) -> None:
        capacity = self.model.params['positions'].shape[0]
        self._grad_accum = np.zeros(capacity, np.float32)
        self._grad_count = np.zeros(capacity, np.float32)
        self._max_radii = np.zeros(capacity, np.float32)

    # -- train step -----------------------------------------------------------------
    def _get_train_step(self, intrinsics: tuple, sh_degree: int, capacity: int):
        key = (intrinsics, sh_degree, capacity)
        if key in self._train_step_cache:
            return self._train_step_cache[key]
        renderer = self.renderer
        optimizer = self.optimizer
        lambda_dssim = float(self.LAMBDA_DSSIM)

        @jax.jit
        def train_step(params, opt_state, w2c, cam_pos, bg, target, step):
            n = params['positions'].shape[0]
            zeros2d = jnp.zeros((n, 2), jnp.float32)

            def loss_fn(p, offset):
                out = renderer.render_impl(p, offset, w2c, cam_pos,
                                           intrinsics=intrinsics,
                                           background=bg,
                                           sh_degree=sh_degree)
                l1 = jnp.mean(jnp.abs(out['rgb'] - target))
                ds = dssim_fn(out['rgb'], target)
                loss = (1.0 - lambda_dssim) * l1 + lambda_dssim * ds
                aux = {'l1': l1, 'dssim': ds, 'total': loss,
                       'psnr': mse_to_psnr(jnp.mean((out['rgb'] - target) ** 2)),
                       'radii': out['radii'],
                       'visible': out['visible'],
                       'overflow_gaussians': out.get(
                           'overflow_gaussians', jnp.zeros((), jnp.int32)),
                       'overflow_entries': out.get(
                           'overflow_entries', jnp.zeros((), jnp.int32))}
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, zeros2d)
            param_grads, viewspace_grads = grads
            updates, opt_state = optimizer.update(param_grads, opt_state,
                                                  params)
            params = optax.apply_updates(params, updates)
            # The offset (and hence its gradient) lives in PIXEL space; the
            # reference rasterizer returns means2D grads in NDC units
            # (scaled by W/2, H/2), which DENSIFY_GRAD_THRESHOLD=2e-4 is
            # calibrated for (reference: Trainer.py:30, rasterizer backward).
            # Convert pixel-space grads to NDC units before taking the norm.
            ndc_scale = jnp.array([0.5 * intrinsics[4], 0.5 * intrinsics[5]],
                                  jnp.float32)
            aux['viewspace_grad_norm'] = jnp.linalg.norm(
                viewspace_grads * ndc_scale, axis=-1)
            return params, opt_state, aux

        self._train_step_cache[key] = train_step
        return train_step

    # -- callbacks ---------------------------------------------------------------------
    @training_callback(priority=100)
    def training_iteration(self, dataset, iteration: int) -> None:
        """(reference: Trainer.py:77-99)"""
        views = dataset.subsets['train']
        view = views[int(self._np_rng.integers(len(views)))]
        intrinsics, w2c, cam_pos = self.renderer.view_constants(view)
        gt = view.rgb
        if view.alpha is not None:
            gt = gt[..., :3] * view.alpha + \
                view.camera.background_color * (1 - view.alpha)
        target = jnp.asarray(gt, jnp.float32)
        bg = jnp.asarray(view.camera.background_color, jnp.float32)
        capacity = self.model.params['positions'].shape[0]
        step = self._get_train_step(intrinsics,
                                    int(self.model.active_sh_degree), capacity)
        self.model.params, self.opt_state, aux = step(
            self.model.params, self.opt_state, w2c, cam_pos, bg, target,
            iteration)
        self._last_logs = {k: aux[k] for k in ('l1', 'dssim', 'total', 'psnr')
                           if k in aux}
        # Surface rasterizer coverage truncation (tile-rect / per-tile caps)
        # instead of dropping it silently.
        if 'overflow_gaussians' in aux and iteration % 500 == 0:
            og = int(aux['overflow_gaussians'])
            oe = int(aux['overflow_entries'])
            if og or oe:
                Logger.verbose(
                    f'iter {iteration}: rasterizer truncation - {og} '
                    f'gaussians exceed the tile rect, {oe} entries beyond '
                    f'the per-tile budget')
        # Densification statistics (reference: Model.py:256-259).
        if int(self.DENSIFY_FROM) <= iteration <= int(self.DENSIFY_UNTIL):
            visible = np.asarray(aux['visible'])
            self._grad_accum[:len(visible)] += np.asarray(
                aux['viewspace_grad_norm']) * visible
            self._grad_count[:len(visible)] += visible
            self._max_radii[:len(visible)] = np.maximum(
                self._max_radii[:len(visible)], np.asarray(aux['radii']))

    @training_callback(priority=90, start_iteration='DENSIFY_FROM',
                       end_iteration='DENSIFY_UNTIL',
                       iteration_stride='DENSIFY_INTERVAL')
    def _densify(self, dataset, iteration: int) -> None:
        """(reference: Trainer.py:101-123)"""
        if iteration <= int(self.DENSIFY_FROM):
            return
        use_screen = iteration > int(self.OPACITY_RESET_INTERVAL)
        self.model.params, self.opt_state = self.model.densify_and_prune(
            self.opt_state, self._grad_accum, self._grad_count,
            float(self.DENSIFY_GRAD_THRESHOLD), self.camera_extent,
            percent_dense=float(self.PERCENT_DENSE),
            min_opacity=float(self.MIN_OPACITY),
            max_screen_size=20.0 if use_screen else None,
            max_radii=self._max_radii)
        self._reset_densify_stats()

    @training_callback(priority=85, start_iteration='OPACITY_RESET_INTERVAL',
                       end_iteration='DENSIFY_UNTIL',
                       iteration_stride='OPACITY_RESET_INTERVAL')
    def _reset_opacity(self, dataset, iteration: int) -> None:
        """(reference: Trainer.py:118-123)"""
        from nerficg_tpu.optim.state_surgery import reset_rows
        self.model.reset_opacity()
        capacity = self.model.params['positions'].shape[0]
        mask = np.zeros(capacity, bool)
        mask[:self.model.num_active] = True
        # Zero the opacity Adam moments: stale second moments would make the
        # clamped opacities snap back within a few steps (reference:
        # src/Optim/adam_utils.py:6-20 resets the opacity group's
        # exp_avg/exp_avg_sq).
        self.opt_state = reset_rows(self.opt_state, mask,
                                    param_key='opacities')
        Logger.verbose(f'iter {iteration}: opacity reset')

    @training_callback(priority=80, iteration_stride='SH_UPDATE_INTERVAL',
                       start_iteration='SH_UPDATE_INTERVAL')
    def _increase_sh_degree(self, dataset, iteration: int) -> None:
        """(reference: Trainer.py:72-75)"""
        if self.model.active_sh_degree < int(self.model.SH_DEGREE):
            self.model.active_sh_degree += 1
            Logger.verbose(f'iter {iteration}: SH degree -> '
                           f'{self.model.active_sh_degree}')

    @training_callback(priority=45, iteration_stride='LOG_INTERVAL',
                       start_iteration='LOG_INTERVAL')
    def _wandb_log_primitives(self, dataset, iteration: int) -> None:
        """Primitive-count scalar + Gaussian-means 3D panel (reference:
        src/Methods/GaussianSplatting/Trainer.py:133-140 logs the point
        count; the 3D panel mirrors the InstantNGP occupancy panel)."""
        wb = getattr(self, '_wandb', None)
        if wb is None or not wb.active:
            return
        n = int(self.model.num_active)
        wb.log({'gaussians/count': n}, step=iteration)
        if n:
            import numpy as np
            SH_C0 = 0.28209479177387814
            pts = np.asarray(self.model.params['positions'][:n])
            cols = np.clip(np.asarray(
                self.model.params['features_dc'][:n, 0]) * SH_C0 + 0.5,
                0.0, 1.0)
            wb.log_point_cloud('gaussians/means', pts, colors=cols,
                               step=iteration)

    @training_callback(priority=50, iteration_stride='LOG_INTERVAL')
    def _log_progress(self, dataset, iteration: int) -> None:
        logs = getattr(self, '_last_logs', None)
        if logs is not None:
            Logger.verbose(
                f'iter {iteration} ({self.model.num_active} gaussians): ' +
                ', '.join(f'{k}={float(v):.4f}' for k, v in logs.items()))

    @post_training_callback(priority=2000)
    def _bake(self, dataset) -> None:
        """(reference: Trainer.py:141-149)"""
        self.model.bake()
        Logger.info(f'baked model: {self.model.num_active} gaussians '
                    '(morton-sorted, pruned)')
