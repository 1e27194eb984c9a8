"""Checkpoint save / load of parameter pytrees + metadata.

Reference equivalent: ``BaseModel.save/load`` (.pt dicts of state_dict +
config params, src/Methods/Base/Model.py:60-111) and the whole-trainer
``.train`` pickles (src/Methods/Base/Trainer.py:94-111).

Format here: a single ``.ckpt`` file = pickled dict of
  {'arrays': {flat_key: np.ndarray}, 'treedef_keys': [...], 'metadata': {...}}
Arrays are converted to host numpy so checkpoints are device-independent, and
dynamic shapes (e.g. 3DGS point counts) round-trip exactly — mirroring the
reference's "re-register unexpected keys on load" behavior (Model.py:81-97)
without needing it: the tree is rebuilt from what was saved.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from nerficg_tpu.core.errors import CheckpointError

__all__ = ['save_checkpoint', 'load_checkpoint', 'flatten_tree', 'unflatten_tree']


def flatten_tree(tree: Any) -> dict[str, np.ndarray]:
    """Pytree -> {'a/b/0': array} flat dict of host numpy arrays."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = '/'.join(_path_part(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _path_part(p) -> str:
    if hasattr(p, 'key'):
        return str(p.key)
    if hasattr(p, 'idx'):
        return str(p.idx)
    if hasattr(p, 'name'):
        return str(p.name)
    return str(p)


def unflatten_tree(flat: dict[str, np.ndarray]) -> dict:
    """Inverse of flatten_tree for dict/list-of-dict trees: rebuild nested dicts
    (integer-looking keys become dict keys, not lists — consumers index by key)."""
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split('/')
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def save_checkpoint(path: str | Path, params: Any, metadata: dict | None = None,
                    extra_trees: dict[str, Any] | None = None) -> None:
    """Save a param pytree (+ optional extra pytrees, e.g. optimizer state)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        'format_version': 1,
        'params': jax.tree_util.tree_map(np.asarray, params),
        'metadata': metadata or {},
        'extra': {name: jax.tree_util.tree_map(np.asarray, tree)
                  for name, tree in (extra_trees or {}).items()},
    }
    tmp = path.with_suffix(path.suffix + '.tmp')
    with open(tmp, 'wb') as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)


def load_checkpoint(path: str | Path, to_device: bool = True) -> dict:
    """Load a checkpoint dict {'params', 'metadata', 'extra'}."""
    path = Path(path)
    if not path.is_file():
        raise CheckpointError(f'checkpoint not found: {path}')
    with open(path, 'rb') as f:
        payload = pickle.load(f)
    if payload.get('format_version') != 1:
        raise CheckpointError(f'unsupported checkpoint version in {path}')
    if to_device:
        payload['params'] = jax.tree_util.tree_map(jnp.asarray, payload['params'])
        payload['extra'] = {k: jax.tree_util.tree_map(jnp.asarray, v)
                            for k, v in payload['extra'].items()}
    return payload
