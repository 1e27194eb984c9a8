"""wandb experiment tracking — optional, no-op when wandb is unavailable.

Reference equivalent: Framework.setup_wandb (src/Framework.py:291-308) and
the trainer's loss/image/sweep logging callbacks
(src/Methods/Base/Trainer.py:308-395).
"""

from __future__ import annotations

from typing import Any, Optional

from nerficg_tpu.core.logging import Logger

__all__ = ['WandbSession']


class WandbSession:
    """Thin wrapper: init/log/finish, silently disabled without wandb."""

    def __init__(self, config: Optional[dict] = None, project: str = 'nerficg_tpu',
                 run_name: Optional[str] = None, active: bool = True):
        self._run = None
        if not active:
            return
        try:
            import wandb
            self._run = wandb.init(project=project, name=run_name,
                                   config=config or {})
            Logger.info(f'wandb run: {self._run.url}')
        except ImportError:
            Logger.warning('wandb not installed; experiment tracking disabled')
        except Exception as exc:  # offline/env errors must not kill training
            Logger.warning(f'wandb init failed: {exc}')

    @property
    def active(self) -> bool:
        return self._run is not None

    def log(self, metrics: dict[str, Any], step: Optional[int] = None) -> None:
        if self._run is not None:
            self._run.log(metrics, step=step)

    def log_image(self, key: str, image, step: Optional[int] = None) -> None:
        if self._run is not None:
            import wandb
            self._run.log({key: wandb.Image(image)}, step=step)

    def log_point_cloud(self, key: str, points, colors=None,
                        step: Optional[int] = None,
                        max_points: int = 65536) -> None:
        """3D point-cloud panel (wandb.Object3D) — used for the occupancy-
        grid and Gaussian-primitive visualizations (reference:
        src/Methods/InstantNGP/utils.py:20-64,
        src/Methods/GaussianSplatting/Trainer.py:133-140)."""
        if self._run is None:
            return
        import numpy as np
        import wandb
        pts = np.asarray(points, np.float32).reshape(-1, 3)
        cols = None if colors is None else np.asarray(colors,
                                                      np.float32)[:, :3]
        if pts.shape[0] > max_points:
            idx = np.random.default_rng(0).choice(pts.shape[0], max_points,
                                                  replace=False)
            pts = pts[idx]
            cols = None if cols is None else cols[idx]
        if cols is not None:
            pts = np.concatenate(
                [pts, np.clip(cols * 255.0, 0, 255)], axis=1)
        self._run.log({key: wandb.Object3D(pts)}, step=step)

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()
            self._run = None
