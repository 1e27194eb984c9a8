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

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()
            self._run = None
