"""Checkpoint save / load of parameter pytrees + metadata.

Reference equivalent: ``BaseModel.save/load`` (.pt dicts of state_dict +
config params, src/Methods/Base/Model.py:60-111) and the whole-trainer
``.train`` pickles (src/Methods/Base/Trainer.py:94-111).

Format here: a single ``.ckpt`` file = an ``npz`` archive (zip of raw ``.npy``
arrays — no pickle, safe to load from untrusted sources) containing
  * ``__meta__``       : JSON string array {'format_version', 'metadata',
                         'tree_names'}
  * ``params/<path>``  : one entry per leaf of the param pytree
  * ``extra/<name>/<path>`` : leaves of each extra tree (optimizer state,
                         buffers, ...)
Arrays are host numpy so checkpoints are device-independent, and dynamic
shapes (e.g. 3DGS point counts) round-trip exactly — mirroring the
reference's "re-register unexpected keys on load" behavior (Model.py:81-97)
without needing it: the tree is rebuilt from what was saved. Trees load back
as nested dicts (namedtuple/list nesting becomes dict keys); consumers that
need an exact optax structure rebuild it from a template treedef
(see GaussianSplattingTrainer.set_optimizer_state).
"""

from __future__ import annotations

import io
import json
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from nerficg_tpu.core.errors import CheckpointError

__all__ = ['save_checkpoint', 'load_checkpoint', 'flatten_tree', 'unflatten_tree']

FORMAT_VERSION = 2


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


def unflatten_tree(flat: dict[str, np.ndarray]):
    """Inverse of flatten_tree for dict/list nestings: rebuild nested dicts,
    then convert any dict whose keys are exactly '0'..'n-1' back into a list
    (so list-structured params, e.g. MLP trunks, iterate correctly after a
    load). A single ''-keyed entry denotes a bare-array tree."""
    if set(flat) == {''}:
        return flat['']
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split('/')
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node) and \
                sorted(int(k) for k in node) == list(range(len(node))):
            return [node[str(i)] for i in range(len(node))]
        return node

    return listify(tree)


def save_checkpoint(path: str | Path, params: Any, metadata: dict | None = None,
                    extra_trees: dict[str, Any] | None = None) -> None:
    """Save a param pytree (+ optional extra pytrees, e.g. optimizer state).

    ``metadata`` must be JSON-serializable."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    trees = {'params': params}
    for name, tree in (extra_trees or {}).items():
        trees[f'extra/{name}'] = tree
    arrays: dict[str, np.ndarray] = {}
    for prefix, tree in trees.items():
        for key, arr in flatten_tree(tree).items():
            arrays[f'{prefix}/{key}' if key else prefix] = arr
    meta = {'format_version': FORMAT_VERSION,
            'metadata': metadata or {},
            'tree_names': sorted(trees)}
    buf = io.BytesIO()
    np.savez(buf, __meta__=np.asarray(json.dumps(meta)), **arrays)
    tmp = path.with_suffix(path.suffix + '.tmp')
    tmp.write_bytes(buf.getvalue())
    tmp.replace(path)


def load_checkpoint(path: str | Path, to_device: bool = True) -> dict:
    """Load a checkpoint dict {'params', 'metadata', 'extra'}.

    Safe for untrusted files: the container is a plain npz archive loaded
    with ``allow_pickle=False``; metadata is JSON."""
    path = Path(path)
    if not path.is_file():
        raise CheckpointError(f'checkpoint not found: {path}')
    try:
        with np.load(path, allow_pickle=False) as z:
            if '__meta__' not in z.files:
                raise CheckpointError(
                    f'{path} is not a nerficg_tpu checkpoint (no __meta__)')
            meta = json.loads(str(z['__meta__']))
            arrays = {k: z[k] for k in z.files if k != '__meta__'}
    except CheckpointError:
        raise
    except Exception as e:  # zip/format errors from np.load
        raise CheckpointError(f'failed to read checkpoint {path}: {e}')
    if meta.get('format_version') != FORMAT_VERSION:
        raise CheckpointError(f'unsupported checkpoint version in {path}')

    def tree_of(prefix: str):
        plen = len(prefix) + 1
        flat = {k[plen:] if len(k) > len(prefix) else '': v
                for k, v in arrays.items()
                if k == prefix or k.startswith(prefix + '/')}
        return unflatten_tree(flat) if flat else {}

    extra = {}
    for name in meta.get('tree_names', []):
        if name.startswith('extra/'):
            extra[name[len('extra/'):]] = tree_of(name)
    payload = {'params': tree_of('params'), 'metadata': meta['metadata'],
               'extra': extra}
    if to_device:
        payload['params'] = jax.tree_util.tree_map(jnp.asarray, payload['params'])
        payload['extra'] = {k: jax.tree_util.tree_map(jnp.asarray, v)
                            for k, v in payload['extra'].items()}
    return payload
