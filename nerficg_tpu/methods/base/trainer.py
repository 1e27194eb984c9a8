"""Training engine: callback-scheduled host loop around jitted device steps.

Reference equivalent: ``BaseTrainer`` (src/Methods/Base/Trainer.py:31-395).

TPU-first redesign: the per-iteration Python callback loop is kept as *host
scheduling* (priorities / strides / gating are host logic, exactly as in the
reference) but each method's ``training_iteration`` is a jitted
``train_step(state, batch, rng)``; methods may additionally run multiple
fused steps per host iteration via ``lax.scan`` (see scan_steps in method
trainers). Timing uses ``block_until_ready`` instead of cuda.synchronize;
"VRAM" stats become device HBM stats.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from nerficg_tpu.core.checkpoint import save_checkpoint
from nerficg_tpu.core.config import ConfigNode, Configurable, save_config
from nerficg_tpu.core.errors import TrainerError
from nerficg_tpu.core.logging import Logger
from nerficg_tpu.core.setup import Directories
from nerficg_tpu.methods.base.callbacks import (MAIN, POST, PRE, CallbackTimer,
                                                gather_callbacks,
                                                post_training_callback,
                                                pre_training_callback,
                                                training_callback)
from nerficg_tpu.methods.base.model import BaseModel
from nerficg_tpu.methods.base.renderer import BaseRenderer

__all__ = ['BaseTrainer']


@Configurable.configure(
    MODEL_NAME='run',
    NUM_ITERATIONS=10000,
    LOAD_CHECKPOINT=None,
    CHECKPOINT={'INTERVAL': None, 'FINAL': True},
    BACKUP={'INTERVAL': None},
    TIMING={'ACTIVATE': True, 'SAMPLE_EVERY': 16,
            'PROFILE': None, 'PROFILE_STEPS': 5},
    WANDB={'ACTIVATE': False, 'INTERVAL': 100, 'PROJECT': 'nerficg_tpu',
           'LOG_IMAGES': False, 'IMAGE_INTERVAL': 1000,
           'INDEX_TRAINING': 0, 'INDEX_VALIDATION': 0,
           'SWEEP_MODE': {'ACTIVE': False, 'START_ITERATION': 1000,
                          'ITERATION_STRIDE': 5000, 'NUM_IMAGES': 0}},
    RENDER_TESTSET=True,
    RENDER_VALSET=False,
    PRELOAD_DATASET=True,
)
class BaseTrainer(Configurable):

    def __init__(self, config: ConfigNode | None, model: BaseModel,
                 renderer: BaseRenderer):
        super().__init__(config, 'TRAINING')
        self._config = config
        self.model = model
        self.renderer = renderer
        self.iteration = model.num_iterations_trained
        self.output_dir: Optional[Path] = None
        self.timers: dict[str, CallbackTimer] = {}
        self.rng = jax.random.PRNGKey(
            int(config.get_path('GLOBAL.RANDOM_SEED', 42)) if config is not None else 42)
        self._wandb = None

    # -- rng ----------------------------------------------------------------------
    def next_rng(self) -> jax.Array:
        self.rng, sub = jax.random.split(self.rng)
        return sub

    # -- run ----------------------------------------------------------------------
    def run(self, dataset) -> None:
        """Main entry (reference: Trainer.py:225-259)."""
        method_name = type(self.model).__name__
        if self.output_dir is None:
            self.output_dir = Directories.output_dir(method_name, self.MODEL_NAME)
        Logger.info(f'training output dir: {self.output_dir}')
        if self._config is not None:
            save_config(self._config, self.output_dir / 'training_config.yaml')

        if self.WANDB.get('ACTIVATE', False) and self._wandb is None:
            from nerficg_tpu.core.wandb_utils import WandbSession
            self._wandb = WandbSession(
                config=self._config.to_dict() if self._config else {},
                project=self.WANDB.get('PROJECT', 'nerficg_tpu'),
                run_name=self.MODEL_NAME)

        num_iterations = int(self.NUM_ITERATIONS)
        fresh = self.iteration == 0
        if fresh:
            for meta, callback in gather_callbacks(self, PRE):
                with self._timer(callback.__name__):
                    callback(dataset)
        else:
            # Resume: rebuild dataset-derived state (ray pools, optimizers)
            # without re-initializing trained parameters, then apply the
            # loaded optimizer state / host counters.
            self.on_resume(dataset)
            self._apply_pending_resume()

        main_callbacks = gather_callbacks(self, MAIN)
        # Optional jax.profiler trace of a window of steps (SURVEY §5.1):
        # TIMING.PROFILE = start iteration (trace covers PROFILE_STEPS its).
        profile_at = self.TIMING.get('PROFILE', None)
        profile_steps = int(self.TIMING.get('PROFILE_STEPS', 5))
        profiling = False
        try:
            progress = Logger.progress(range(self.iteration, num_iterations),
                                       desc='training', total=num_iterations)
            for iteration in progress:
                self.iteration = iteration
                if profile_at is not None and self.output_dir is not None:
                    if iteration == int(profile_at):
                        jax.profiler.start_trace(
                            str(self.output_dir / 'profile'))
                        profiling = True
                    elif profiling and \
                            iteration == int(profile_at) + profile_steps:
                        jax.profiler.stop_trace()
                        profiling = False
                        Logger.info(f'wrote profiler trace to '
                                    f'{self.output_dir / "profile"}')
                for meta, callback in main_callbacks:
                    if meta.is_due(iteration):
                        with self._timer(callback.__name__):
                            callback(dataset, iteration)
                self.model.num_iterations_trained = iteration + 1
            if profiling:
                jax.profiler.stop_trace()
                profiling = False
        except KeyboardInterrupt:
            # Finish post-training cleanly (reference: Trainer.py:248-249).
            Logger.warning('training interrupted; running post-training callbacks')

        self._log_memory_stats()
        for meta, callback in gather_callbacks(self, POST):
            with self._timer(callback.__name__):
                callback(dataset)
        if self.TIMING.get('ACTIVATE', True):
            self._write_timings()

    # -- timing / memory ---------------------------------------------------------------
    def _timer(self, name: str) -> CallbackTimer:
        if not self.TIMING.get('ACTIVATE', True):
            class _Null:
                def __enter__(self):
                    return self

                def __exit__(self, *a):
                    return False
            return _Null()
        if name not in self.timers:
            self.timers[name] = CallbackTimer(
                name, sample_every=int(self.TIMING.get('SAMPLE_EVERY', 16)))
        return self.timers[name]

    def _write_timings(self) -> None:
        """timings.txt (reference: Trainer.py:182-207)."""
        if self.output_dir is None:
            return
        with open(self.output_dir / 'timings.txt', 'w') as f:
            total = sum(t.total for t in self.timers.values())
            for name, timer in sorted(self.timers.items(),
                                      key=lambda kv: -kv[1].total):
                f.write(timer.summary() + '\n')
            f.write(f'total: {total:.3f}s\n')

    def _log_memory_stats(self) -> None:
        """HBM stats file, the TPU analog of vram_stats.txt
        (reference: Trainer.py:209-223)."""
        if self.output_dir is None:
            return
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
        except Exception:
            stats = {}
        with open(self.output_dir / 'vram_stats.txt', 'w') as f:
            peak = stats.get('peak_bytes_in_use', 0)
            limit = stats.get('bytes_limit', 0)
            f.write(f'peak HBM in use: {peak / 2**30:.3f} GiB\n')
            f.write(f'HBM limit: {limit / 2**30:.3f} GiB\n')
            for key, value in sorted(stats.items()):
                f.write(f'{key}: {value}\n')

    # -- checkpoint / resume ---------------------------------------------------------
    def save_training_state(self, path: str | Path,
                            iteration: int | None = None) -> None:
        """Whole-trainer resume file (reference: Trainer.py:94-111): model
        params + buffers + optimizer state + host counters. Stored in the
        same safe npz container as model checkpoints (no pickle).
        ``iteration`` is the first iteration to run after resume."""
        save_checkpoint(
            Path(path), self.model.params,
            metadata={'iteration': int(self.iteration if iteration is None
                                       else iteration),
                      'trainer': type(self).__name__,
                      'resume_state': self.get_resume_metadata()},
            extra_trees={'buffers': self.model.buffers,
                         'optimizer': self.get_optimizer_state(),
                         'rng': np.asarray(self.rng)})

    def load_training_state(self, path: str | Path) -> None:
        """Restore params/buffers now; optimizer state and host counters are
        applied in ``run()`` after ``on_resume`` has rebuilt the optimizer
        (method optimizers may not exist until dataset setup)."""
        import jax.numpy as jnp

        from nerficg_tpu.core.checkpoint import load_checkpoint
        payload = load_checkpoint(path)
        meta = payload['metadata']
        self.iteration = int(meta['iteration'])
        self.model.num_iterations_trained = self.iteration
        self.model.params = payload['params']
        self.model.buffers = payload['extra'].get('buffers', {})
        rng = payload['extra'].get('rng', None)
        if rng is not None and hasattr(rng, 'shape'):
            self.rng = jnp.asarray(rng)
        self._pending_resume = {
            'optimizer': payload['extra'].get('optimizer', {}),
            'resume_state': meta.get('resume_state', {}),
        }

    def _apply_pending_resume(self) -> None:
        pending = getattr(self, '_pending_resume', None)
        if pending is None:
            return
        self.set_resume_metadata(pending['resume_state'] or {})
        if pending['optimizer']:
            self.set_optimizer_state(pending['optimizer'])
        self._pending_resume = None

    def on_resume(self, dataset) -> None:
        """Rebuild dataset-derived state after ``load_training_state``
        WITHOUT re-initializing trained parameters; methods override."""

    def get_resume_metadata(self) -> dict:
        """JSON-serializable host counters to persist in resume files;
        methods override (e.g. dynamic ray-batch size, SH degree)."""
        return {}

    def set_resume_metadata(self, meta: dict) -> None:
        pass

    def get_optimizer_state(self):
        """Methods override to expose optimizer state for resume files."""
        return {}

    def set_optimizer_state(self, state) -> None:
        pass

    # -- built-in callbacks -----------------------------------------------------------
    @pre_training_callback(priority=5000)
    def _prepare_dataset(self, dataset) -> None:
        """Image preloading (reference: Trainer.py:122-161)."""
        if self.PRELOAD_DATASET:
            dataset.preload()

    @training_callback(priority=10, active='WANDB.ACTIVATE',
                       iteration_stride='WANDB.INTERVAL')
    def _wandb_log(self, dataset, iteration: int) -> None:
        """Interval loss logging (reference: Trainer.py:308-351)."""
        logs = getattr(self, '_last_logs', None)
        if self._wandb is not None and self._wandb.active and logs:
            self._wandb.log({k: float(v) for k, v in logs.items()},
                            step=iteration)

    @training_callback(priority=9, active='WANDB.ACTIVATE',
                       iteration_stride='WANDB.IMAGE_INTERVAL')
    def _wandb_log_images(self, dataset, iteration: int) -> None:
        """Train/validation render grids (reference: Trainer.py:308-346):
        rendered outputs side by side with the ground-truth image."""
        if self._wandb is None or not self._wandb.active or \
                not self.WANDB.get('LOG_IMAGES', False):
            return
        import numpy as np

        for mode, idx_key, name in (
                ('train', 'INDEX_TRAINING', 'training'),
                ('val', 'INDEX_VALIDATION', 'validation')):
            getattr(dataset, mode)()
            if not dataset.views:
                continue
            index = int(self.WANDB.get(idx_key, 0)) % len(dataset.views)
            view = dataset.views[index]
            out = self.renderer.render_image(view)
            panels = [np.asarray(out['rgb'])]
            if view.rgb_data.exists():
                panels.append(np.asarray(view.rgb))
            grid = np.concatenate(
                [np.clip(p, 0.0, 1.0) for p in panels], axis=1)
            self._wandb.log_image(name, grid, step=iteration)
        dataset.train()

    @training_callback(priority=8, active='WANDB.SWEEP_MODE.ACTIVE',
                       start_iteration='WANDB.SWEEP_MODE.START_ITERATION',
                       iteration_stride='WANDB.SWEEP_MODE.ITERATION_STRIDE')
    def _wandb_sweep_metrics(self, dataset, iteration: int) -> None:
        """Test-set PSNR/SSIM(/LPIPS) + the MipNeRF geometric-mean combined
        metric for hyperparameter sweeps (reference: Trainer.py:353-395)."""
        if self._wandb is None or not self._wandb.active:
            Logger.warning('sweep mode requires wandb; skipping test metrics')
            return
        import math
        import random as _random

        import numpy as np

        from nerficg_tpu.optim.metrics import (lpips, lpips_available,
                                               psnr, ssim)
        dataset.test()
        if not dataset.views:
            dataset.train()
            return
        indices = list(range(len(dataset.views)))
        cap = int(self.WANDB['SWEEP_MODE'].get('NUM_IMAGES', 0))
        if 0 < cap < len(indices):
            indices = _random.sample(indices, k=cap)
        psnrs, ssims, lpipss = [], [], []
        for i in indices:
            view = dataset.views[i]
            pred = np.clip(np.asarray(
                self.renderer.render_image(view)['rgb']), 0.0, 1.0)
            gt = np.asarray(view.rgb)
            if view.alpha_data.exists():
                alpha = np.asarray(view.alpha)
                bg = np.asarray(view.camera.background_color)
                gt = gt * alpha + bg * (1.0 - alpha)
            psnrs.append(float(psnr(pred, gt)))
            ssims.append(float(ssim(pred, gt)))
            if lpips_available():
                lpipss.append(float(lpips(pred, gt)))
        m_psnr = sum(psnrs) / len(psnrs)
        m_ssim = sum(ssims) / len(ssims)
        m_lpips = sum(lpipss) / len(lpipss) if lpipss else float('nan')
        terms = [-0.1 * math.log(10.0) * m_psnr,
                 math.log(math.sqrt(max(1.0 - m_ssim, 1e-12)))]
        if lpipss:
            terms.append(math.log(max(m_lpips, 1e-12)))
        combined = math.exp(sum(terms) / len(terms))
        self._wandb.log({'test_psnr': m_psnr, 'test_ssim': m_ssim,
                         'test_lpips': m_lpips,
                         'combined_metrics': combined}, step=iteration)
        dataset.train()

    @post_training_callback(priority=100)
    def _wandb_finish(self, dataset) -> None:
        if self._wandb is not None:
            self._wandb.finish()

    @training_callback(priority=6, active='CHECKPOINT.INTERVAL',
                       start_iteration='CHECKPOINT.INTERVAL',
                       iteration_stride='CHECKPOINT.INTERVAL')
    def _periodic_checkpoint(self, dataset, iteration: int) -> None:
        """Intermediate model checkpoints (reference: Trainer.py:163-171)."""
        if self.output_dir is not None:
            self.model.save(
                self.output_dir / 'checkpoints' / f'{iteration:07d}.ckpt')
            Logger.verbose(f'iter {iteration}: saved intermediate checkpoint')

    @training_callback(priority=5, active='BACKUP.INTERVAL',
                       start_iteration='BACKUP.INTERVAL',
                       iteration_stride='BACKUP.INTERVAL')
    def _periodic_backup(self, dataset, iteration: int) -> None:
        """Whole-training-state backup for lossless resume (reference:
        Trainer.py:94-111, 172-180): a crash mid-run resumes from here via
        ``train.py --resume``."""
        if self.output_dir is not None:
            # iteration+1: this iteration's training callback already ran
            # (priority 100 > 5), so resume starts at the next one.
            self.save_training_state(self.output_dir / 'latest.train',
                                     iteration=iteration + 1)
            Logger.verbose(f'iter {iteration}: saved training-state backup')

    @post_training_callback(priority=1000)
    def _save_final_checkpoint(self, dataset) -> None:
        """(reference: Trainer.py:163-180)"""
        if self.CHECKPOINT.get('FINAL', True) and self.output_dir is not None:
            self.model.save(self.output_dir / 'checkpoints' / 'final.ckpt')
            Logger.info('saved final checkpoint')

    @post_training_callback(priority=500)
    def _render_testset(self, dataset) -> None:
        if self.RENDER_TESTSET and self.output_dir is not None:
            dataset.test()
            if dataset.views:
                self.renderer.render_subset(dataset, 'test',
                                            output_dir=self.output_dir / 'test',
                                            save_gt=False, compute_metrics=True)
            dataset.train()
