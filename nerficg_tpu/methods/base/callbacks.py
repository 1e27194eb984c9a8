"""Training callback engine: decorators + scheduling + timing.

Reference equivalent: src/Methods/Base/utils.py:12-92 (callback decorators and
``CallbackTimer``) and the gating/resolution logic in
src/Methods/Base/Trainer.py:261-291.

Host-side scheduling only: callbacks decide *when* device work runs; the work
itself is jitted functions. The timer uses ``jax.block_until_ready`` in place
of ``torch.cuda.synchronize``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax

__all__ = ['pre_training_callback', 'training_callback', 'post_training_callback',
           'CallbackTimer', 'gather_callbacks', 'resolve_callback_config',
           'CallbackMeta']

PRE, MAIN, POST = -1, 0, 1


@dataclass
class CallbackMeta:
    callback_type: int
    active: Any = True                  # bool or config-key string
    priority: int = 50
    start_iteration: Any = 0            # int or config-key string
    end_iteration: Any = None
    iteration_stride: Any = 1

    def resolve(self, trainer) -> 'CallbackMeta':
        """Resolve string-valued attributes against the trainer's config
        (reference: Trainer.py:261-285)."""
        def _res(value):
            # String values name trainer/config attributes; a missing or None
            # value disables/neutralizes the field (reference resolves strings
            # the same way, Trainer.py:268-277).
            if isinstance(value, str):
                return _lookup_attr(trainer, value)
            return value
        end = self.end_iteration
        end_resolved = None if end is None else _res(end)
        return CallbackMeta(
            callback_type=self.callback_type,
            active=bool(_res(self.active)),
            priority=int(_res(self.priority)),
            start_iteration=int(_res(self.start_iteration) or 0),
            end_iteration=None if end_resolved is None else int(end_resolved),
            iteration_stride=max(int(_res(self.iteration_stride) or 1), 1))

    def is_due(self, iteration: int) -> bool:
        if not self.active:
            return False
        if iteration < self.start_iteration:
            return False
        if self.end_iteration is not None and iteration > self.end_iteration:
            return False
        return (iteration - self.start_iteration) % self.iteration_stride == 0


def _lookup_attr(trainer, dotted: str):
    node = trainer
    for part in dotted.split('.'):
        node = getattr(node, part, None) if not isinstance(node, dict) \
            else node.get(part)
        if node is None:
            return None
    return node


def _make_decorator(callback_type: int):
    def factory(active: Any = True, priority: int = 50,
                start_iteration: Any = 0, end_iteration: Any = None,
                iteration_stride: Any = 1):
        def decorator(fn: Callable) -> Callable:
            fn.__callback_meta__ = CallbackMeta(
                callback_type=callback_type, active=active, priority=priority,
                start_iteration=start_iteration, end_iteration=end_iteration,
                iteration_stride=iteration_stride)
            return fn
        return decorator
    return factory


pre_training_callback = _make_decorator(PRE)
training_callback = _make_decorator(MAIN)
post_training_callback = _make_decorator(POST)


def gather_callbacks(trainer, callback_type: int) -> list[tuple[CallbackMeta, Callable]]:
    """Class-member reflection, sorted by priority desc
    (reference: Trainer.py:287-291)."""
    found = []
    for name in dir(type(trainer)):
        member = getattr(type(trainer), name, None)
        meta: Optional[CallbackMeta] = getattr(member, '__callback_meta__', None)
        if meta is not None and meta.callback_type == callback_type:
            resolved = meta.resolve(trainer)
            if resolved.active:
                found.append((resolved, getattr(trainer, name)))
    found.sort(key=lambda pair: -pair[0].priority)
    return found


def resolve_callback_config(trainer, key: str, default=None):
    value = _lookup_attr(trainer, key)
    return default if value is None else value


class CallbackTimer:
    """Accumulating wall-time timer with device sync
    (reference: Methods/Base/utils.py:12-33).

    ``sample_every``: sync the device only on every Nth exit — a sync
    round trip through remote transports costs tens of ms (PERF_NOTES.md),
    which at per-iteration granularity would dominate training. Sampled
    syncing keeps the totals statistically correct (async dispatch time
    folds into the sampled calls) at 1/N of the cost."""

    def __init__(self, name: str = '', sample_every: int = 1):
        self.name = name
        self.total = 0.0
        self.count = 0
        self._start = 0.0
        self._sample_every = max(int(sample_every), 1)

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        # Device sync so accumulated time includes dispatched work
        # (TPU analog of torch.cuda.synchronize).
        if self.count % self._sample_every == 0:
            jax.effects_barrier()
        self.total += time.perf_counter() - self._start
        self.count += 1
        return False

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)

    def summary(self) -> str:
        return (f'{self.name}: total {self.total:.3f}s over {self.count} calls '
                f'(mean {self.mean * 1e3:.3f}ms)')
