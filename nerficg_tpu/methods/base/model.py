"""Model base class: parameter pytree container with checkpoint round-trip.

Reference equivalent: ``BaseModel`` (src/Methods/Base/Model.py:15-111).
TPU-first redesign: a model is a thin host object holding (a) hyperparameters
from the MODEL config section, (b) a ``params`` parameter pytree, and (c) pure
``apply``-style functions used inside jitted steps. There is no nn.Module
state — saving/loading moves the raw pytree, so dynamically-shaped parameters
(3DGS point counts) round-trip without the reference's "unexpected key
re-registration" dance (Model.py:81-97).
"""

from __future__ import annotations

import datetime
from pathlib import Path
from typing import Any, Optional

import jax

from nerficg_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from nerficg_tpu.core.config import ConfigNode, Configurable
from nerficg_tpu.core.errors import ModelError

__all__ = ['BaseModel']


class BaseModel(Configurable):

    def __init__(self, config: ConfigNode | None, name: str | None = None):
        super().__init__(config, 'MODEL')
        self._config = config
        self.model_name = name or (
            config.get_path('TRAINING.MODEL_NAME') if config is not None else None
        ) or type(self).__name__
        self.params: Any = None          # parameter pytree
        self.buffers: Any = {}           # non-trained state (e.g. occupancy grid)
        self.num_iterations_trained: int = 0

    # -- plugin contract ------------------------------------------------------
    def build(self, rng: Optional[jax.Array] = None) -> 'BaseModel':
        """Create ``self.params`` / ``self.buffers`` (reference: Model.py:30-35)."""
        raise NotImplementedError

    def get_ply_dict(self) -> dict:
        """Point-based export hook (reference: Model.py:37); {} if unsupported."""
        return {}

    # -- checkpointing ----------------------------------------------------------
    def save(self, path: str | Path) -> None:
        """(reference: Model.py:103-111)"""
        if self.params is None:
            raise ModelError('model not built; nothing to save')
        save_checkpoint(
            path, self.params,
            metadata={
                'method': type(self).__name__,
                'model_name': self.model_name,
                'num_iterations_trained': self.num_iterations_trained,
                'configuration': self._configuration.to_dict(),
                'saved_at': datetime.datetime.now().isoformat(),
            },
            extra_trees={'buffers': self.buffers})

    @classmethod
    def load(cls, path: str | Path, config: ConfigNode | None = None) -> 'BaseModel':
        """(reference: Model.py:60-101)"""
        payload = load_checkpoint(path)
        meta = payload['metadata']
        # Restore the saved MODEL configuration so hyperparameters match the
        # checkpoint (overridable by the provided config's MODEL section).
        merged = ConfigNode({'MODEL': meta.get('configuration', {})})
        if config is not None and 'MODEL' in config:
            from nerficg_tpu.core.config import recursive_update
            recursive_update(merged['MODEL'], config['MODEL'])
        model = cls(merged, name=meta.get('model_name'))
        model.params = payload['params']
        model.buffers = payload['extra'].get('buffers', {})
        model.num_iterations_trained = int(meta.get('num_iterations_trained', 0))
        return model

    # -- utilities ------------------------------------------------------------------
    def num_parameters(self) -> int:
        if self.params is None:
            return 0
        return sum(int(x.size) for x in jax.tree_util.tree_leaves(self.params))
