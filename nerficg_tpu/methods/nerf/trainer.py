"""NeRF trainer: Adam + log-lerp LR decay, ray-pool batches, MSE loss.

Reference equivalent: src/Methods/NeRF/Trainer.py (Adam + LRDecayPolicy
5e-4 -> 5e-5, :30-38; per-iteration 1024-ray batches, :44-64; optional
validation iteration, :66-74) and src/Methods/NeRF/Loss.py:10-45 (MSE color
+ optional coarse + optional alpha, PSNR metric).

TPU-first: the whole optimization step — gather rays from the on-device ray
pool, hierarchical render, loss, backward, Adam update — is one jitted
function; the host loop only draws random indices and schedules callbacks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerficg_tpu.core.config import Configurable
from nerficg_tpu.core.logging import Logger
from nerficg_tpu.methods.base.callbacks import (post_training_callback,
                                                pre_training_callback,
                                                training_callback)
from nerficg_tpu.methods.base.trainer import BaseTrainer
from nerficg_tpu.optim.losses import LossContainer, mse
from nerficg_tpu.optim.lr import lr_decay_policy
from nerficg_tpu.optim.metrics import mse_to_psnr

__all__ = ['NeRFTrainer']


@Configurable.configure(
    NUM_ITERATIONS=500000,
    RAYS_PER_BATCH=1024,
    LR_INIT=5e-4,
    LR_FINAL=5e-5,
    ALPHA_LOSS_WEIGHT=0.0,
    COARSE_LOSS_WEIGHT=1.0,
    VALIDATION_INTERVAL=None,
    LOG_INTERVAL=500,
)
class NeRFTrainer(BaseTrainer):

    def __init__(self, config, model, renderer):
        super().__init__(config, model, renderer)
        schedule = lr_decay_policy(float(self.LR_INIT), float(self.LR_FINAL),
                                   int(self.NUM_ITERATIONS))
        self.optimizer = optax.adam(learning_rate=schedule)
        self.opt_state = None
        self.loss_container = LossContainer()
        self.loss_container.add_loss('color', mse, 1.0)
        if float(self.COARSE_LOSS_WEIGHT) > 0:
            self.loss_container.add_loss('coarse', mse,
                                         float(self.COARSE_LOSS_WEIGHT))
        if float(self.ALPHA_LOSS_WEIGHT) > 0:
            self.loss_container.add_loss('alpha', mse,
                                         float(self.ALPHA_LOSS_WEIGHT))
        self._pool = None           # on-device ray pool arrays
        self._train_step = None

    # -- optimizer state for resume files ------------------------------------------
    def get_optimizer_state(self):
        return self.opt_state if self.opt_state is not None else {}

    def set_optimizer_state(self, state) -> None:
        if state:
            # Rebuild the structured optax state from the saved pytree.
            template = self.optimizer.init(self.model.params)
            flat_saved = jax.tree_util.tree_leaves(state)
            treedef = jax.tree_util.tree_structure(template)
            self.opt_state = jax.tree_util.tree_unflatten(treedef, flat_saved)

    # -- setup ------------------------------------------------------------------------
    @pre_training_callback(priority=4000)
    def _init_samplers(self, dataset) -> None:
        """Precompute the train-split ray pool on device
        (reference: NeRF/Trainer.py:40-50)."""
        collection = dataset.precompute_rays('train')
        rays = collection.rays
        self._pool = {
            'origins': jnp.asarray(rays.origins),
            'directions': jnp.asarray(rays.directions),
            'rgb': jnp.asarray(rays.rgb) if rays.rgb is not None else None,
            'alpha': jnp.asarray(rays.alpha) if rays.alpha is not None else None,
        }
        self._pool_size = int(self._pool['origins'].shape[0])
        self._np_rng = np.random.default_rng(
            int(self._config.get_path('GLOBAL.RANDOM_SEED', 42))
            if self._config is not None else 42)
        cs = dataset.camera_settings
        self.renderer.bind_camera_settings(cs)
        self._near = jnp.asarray(cs.near, jnp.float32)
        self._far = jnp.asarray(cs.far, jnp.float32)
        self._bg = jnp.asarray(cs.background_color, jnp.float32)
        if self.opt_state is None:
            self.opt_state = self.optimizer.init(self.model.params)
        self._build_train_step()

    def on_resume(self, dataset) -> None:
        """Rebuild the ray pool / train step; params + optimizer state come
        from the resume file (applied after this hook)."""
        self._init_samplers(dataset)

    def _build_train_step(self) -> None:
        renderer = self.renderer
        optimizer = self.optimizer
        has_alpha = self._pool['alpha'] is not None
        coarse_w = float(self.COARSE_LOSS_WEIGHT)
        alpha_w = float(self.ALPHA_LOSS_WEIGHT)

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, pool, ids, rng, near, far, bg, step):
            origins = pool['origins'][ids]
            directions = pool['directions'][ids]
            target_rgb = pool['rgb'][ids]
            target_alpha = pool['alpha'][ids] if has_alpha else None
            if target_alpha is not None:
                # Composite ground truth onto the same background the renderer
                # blends in (reference: NeRF/Trainer.py:55-58) — without this
                # the model must explain empty black pixels with fog.
                target_rgb = target_rgb * target_alpha + bg * (1 - target_alpha)

            def loss_fn(p):
                out = renderer._render_rays_impl(
                    p, origins, directions, rng, near, far, bg, randomized=True)
                loss = jnp.mean((out['rgb'] - target_rgb) ** 2)
                logs = {'color': loss}
                if 'coarse_rgb' in out and coarse_w > 0:
                    closs = jnp.mean((out['coarse_rgb'] - target_rgb) ** 2)
                    loss = loss + coarse_w * closs
                    logs['coarse'] = closs
                if target_alpha is not None and alpha_w > 0:
                    aloss = jnp.mean((out['alpha'] - target_alpha) ** 2)
                    loss = loss + alpha_w * aloss
                    logs['alpha'] = aloss
                logs['total'] = loss
                logs['psnr'] = mse_to_psnr(logs['color'])
                return loss, logs

            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, logs

        self._train_step = train_step

    # -- main loop -----------------------------------------------------------------------
    @training_callback(priority=100)
    def training_iteration(self, dataset, iteration: int) -> None:
        """(reference: NeRF/Trainer.py:52-64)"""
        ids = jnp.asarray(self._np_rng.integers(
            0, self._pool_size, size=int(self.RAYS_PER_BATCH)), jnp.int32)
        rng = self.next_rng()
        self.model.params, self.opt_state, logs = self._train_step(
            self.model.params, self.opt_state, self._pool, ids, rng,
            self._near, self._far, self._bg, iteration)
        self._last_logs = logs

    @training_callback(priority=50, iteration_stride='LOG_INTERVAL')
    def _log_progress(self, dataset, iteration: int) -> None:
        logs = getattr(self, '_last_logs', None)
        if logs is not None:
            Logger.verbose(
                f'iter {iteration}: ' +
                ', '.join(f'{k}={float(v):.4f}' for k, v in logs.items()))

    @training_callback(priority=40, active='VALIDATION_INTERVAL',
                       iteration_stride='VALIDATION_INTERVAL')
    def _validate(self, dataset, iteration: int) -> None:
        """(reference: NeRF/Trainer.py:66-74)"""
        val = dataset.subsets.get('val') or dataset.subsets.get('test')
        if val:
            view = val[0]
            out = self.renderer.render_image(view, rng=self.next_rng())
            gt = view.rgb
            if gt is not None:
                err = float(jnp.mean(
                    (out['rgb'] - jnp.asarray(gt[..., :3])) ** 2))
                Logger.info(f'validation iter {iteration}: '
                            f'psnr={float(mse_to_psnr(jnp.asarray(err))):.3f}')

