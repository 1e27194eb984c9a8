"""Optimizer-state surgery: prune / extend / reset Adam moments with params.

Reference equivalent: src/Optim/adam_utils.py:6-103 (replace/prune/extend/
sort param groups *with* their exp_avg/exp_avg_sq state — the backbone of
3DGS densification).

Here the optimizer is optax; its state may contain ANY number of
``ScaleByAdamState`` nodes (one per group under ``optax.multi_transform``,
whose masked groups hold ``MaskedNode`` placeholders). Surgery maps a row
transformation over params and over the mu/nu arrays of every Adam state it
finds, leaving placeholders and counts untouched. Densification runs on host
numpy between jitted steps.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ['apply_row_surgery', 'reset_rows', 'adam_moment_trees',
           'rebuild_adam_state']


def _is_adam_state(x) -> bool:
    return isinstance(x, optax.ScaleByAdamState)


def _map_moment_arrays(tree: Any, fn: Callable) -> Any:
    """Apply fn to array leaves, passing MaskedNode-style placeholders through."""
    def handle(leaf):
        if hasattr(leaf, 'shape') and getattr(leaf, 'ndim', 0) >= 1:
            return jnp.asarray(fn(np.asarray(leaf)))
        return leaf
    return jax.tree_util.tree_map(handle, tree)


def apply_row_surgery(params: Any, opt_state,
                      fn: Callable[[np.ndarray], np.ndarray]):
    """Apply ``fn`` (a per-array row transform, e.g. select/concat) to every
    param leaf and to the mu/nu moments of every Adam state in ``opt_state``
    (reference: adam_utils.py:21-62). ``fn`` takes/returns host numpy arrays.
    """
    new_params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(fn(np.asarray(a))), params)

    def fix(item):
        if _is_adam_state(item):
            return optax.ScaleByAdamState(
                count=item.count,
                mu=_map_moment_arrays(item.mu, fn),
                nu=_map_moment_arrays(item.nu, fn))
        return item

    new_opt_state = jax.tree_util.tree_map(fix, opt_state, is_leaf=_is_adam_state)
    return new_params, new_opt_state


def reset_rows(opt_state, row_mask: np.ndarray, param_key: str | None = None):
    """Zero the Adam moments of the selected rows (used after opacity reset,
    reference: adam_utils.py:64-80). If ``param_key`` is given, only moments
    of that parameter are reset."""
    mask = jnp.asarray(row_mask)

    def zero_rows(a):
        if not (hasattr(a, 'shape') and getattr(a, 'ndim', 0) >= 1):
            return a
        shaped = mask.reshape(mask.shape[0], *([1] * (a.ndim - 1)))
        return jnp.where(shaped, jnp.zeros_like(a), a)

    def map_tree(tree):
        if param_key is None:
            return jax.tree_util.tree_map(zero_rows, tree)
        if isinstance(tree, dict):
            return {k: (jax.tree_util.tree_map(zero_rows, v)
                        if k == param_key else v) for k, v in tree.items()}
        return tree

    def fix(item):
        if _is_adam_state(item):
            return optax.ScaleByAdamState(count=item.count,
                                          mu=map_tree(item.mu),
                                          nu=map_tree(item.nu))
        return item

    return jax.tree_util.tree_map(fix, opt_state, is_leaf=_is_adam_state)


# -- single-adam helpers (kept for simple optimizers / tests) -------------------

def adam_moment_trees(opt_state):
    """Return (count, mu, nu) from the FIRST adam state found."""
    for item in jax.tree_util.tree_leaves(opt_state, is_leaf=_is_adam_state):
        if _is_adam_state(item):
            return item.count, item.mu, item.nu
    raise ValueError('no ScaleByAdamState found in optimizer state')


def rebuild_adam_state(opt_state, count, mu, nu):
    """Replace the FIRST adam state (single-optimizer states only)."""
    done = [False]

    def replace(item):
        if _is_adam_state(item) and not done[0]:
            done[0] = True
            return optax.ScaleByAdamState(count=count, mu=mu, nu=nu)
        return item

    return jax.tree_util.tree_map(replace, opt_state, is_leaf=_is_adam_state)
