"""Framework exception taxonomy.

Reference equivalent: the 14 exception classes in src/Framework.py:360-428
(each logs on construction). Kept as a typed hierarchy so callers can catch
specific failure classes; all log through ``Logger.error`` at raise time.
"""

from __future__ import annotations

import functools
import traceback
from typing import Callable

from nerficg_tpu.core.logging import Logger

__all__ = [
    'FrameworkError', 'ConfigError', 'CheckpointError', 'DatasetError',
    'CameraError', 'ModelError', 'RendererError', 'TrainerError',
    'SamplerError', 'LossError', 'MethodError', 'VisualizationError',
    'KernelError', 'ShardingError', 'GuiError', 'catch',
]


class FrameworkError(Exception):
    """Base class; logs the message on construction (reference: Framework.py:360)."""

    def __init__(self, message: str = ''):
        super().__init__(message)
        if message:
            Logger.error(f'{type(self).__name__}: {message}')


class ConfigError(FrameworkError):
    """Invalid or missing configuration."""


class CheckpointError(FrameworkError):
    """Checkpoint save/load failure."""


class DatasetError(FrameworkError):
    """Dataset loading or validation failure."""


class CameraError(FrameworkError):
    """Camera model misuse or invalid intrinsics."""


class ModelError(FrameworkError):
    """Model construction or parameter failure."""


class RendererError(FrameworkError):
    """Renderer failure (wrong model type, invalid outputs)."""


class TrainerError(FrameworkError):
    """Training-loop failure."""


class SamplerError(FrameworkError):
    """Ray/view sampler failure."""


class LossError(FrameworkError):
    """Loss configuration or computation failure."""


class MethodError(FrameworkError):
    """Unknown method or broken method plugin."""


class VisualizationError(FrameworkError):
    """Colormap / trajectory failure."""


class KernelError(FrameworkError):
    """Pallas / native kernel failure."""


class ShardingError(FrameworkError):
    """Mesh / sharding configuration failure."""


class GuiError(FrameworkError):
    """GUI process / shared-state failure."""


_seen_tracebacks: set[str] = set()


def catch(cleanup: Callable | None = None):
    """Decorator: swallow and log exceptions, deduplicated by traceback.

    Reference equivalent: ``Framework.catch`` (src/Framework.py:327-356), used
    so GUI / logging callbacks cannot kill a training run.
    """

    def decorator(fn: Callable):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except Exception:
                tb = traceback.format_exc()
                if tb not in _seen_tracebacks:
                    _seen_tracebacks.add(tb)
                    Logger.error(f'caught exception in {fn.__qualname__}:\n{tb}')
                if cleanup is not None:
                    cleanup(*args, **kwargs)
                return None
        return wrapper

    return decorator
