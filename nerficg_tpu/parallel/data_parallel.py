"""Data-parallel training steps over a device mesh.

Reference equivalent: the reference's entire multi-device story is a
``torch.nn.DataParallel`` wrap (src/Methods/Base/Renderer.py:20-38) —
single-process replicate/scatter/gather per forward, training-path only
warned off for INGP/GS.

TPU-native replacement: the whole train step runs under ``shard_map`` over a
1-D ``data`` mesh — ray batches are sharded on their leading axis, parameters
and optimizer state are replicated, and gradients are averaged with one
``psum``-backed ``pmean`` over ICI before the (replicated) optimizer update.
``shard_map`` (not plain jit sharding) is required because the hot path
contains Pallas kernels, which have no SPMD partitioning rule — inside
shard_map each device runs the kernel on its local shard. Multi-host follows
by constructing the mesh over ``jax.devices()`` after
``jax.distributed.initialize``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerficg_tpu.parallel.mesh import DATA_AXIS

try:  # moved between jax versions
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

__all__ = ['make_data_parallel_train_step', 'shard_batch_spec']


def shard_batch_spec() -> P:
    return P(DATA_AXIS)


def make_data_parallel_train_step(mesh: Mesh,
                                  grad_fn: Callable,
                                  optimizer: optax.GradientTransformation,
                                  donate: bool = True) -> Callable:
    """Build a jitted SPMD train step.

    grad_fn(params, batch, rng) -> ((loss, logs), grads) where ``batch`` is a
    pytree of (N, ...) arrays; N must divide by the mesh size. Per-device rng
    is decorrelated by folding in the device index.

    Returns step(params, opt_state, batch, rng) -> (params, opt_state, logs);
    params/opt_state replicated, batch sharded on the leading axis.
    """

    def per_shard(params, opt_state, batch, rng):
        local_rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        (loss, logs), grads = grad_fn(params, batch, local_rng)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        logs = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, DATA_AXIS) if jnp.issubdtype(
                jnp.asarray(x).dtype, jnp.floating) else x, logs)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, logs

    try:  # jax >= 0.8: check_vma; older: check_rep
        mapped = shard_map(
            per_shard, mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS), P()),
            out_specs=(P(), P(), P()),
            check_vma=False)
    except TypeError:  # pragma: no cover
        mapped = shard_map(
            per_shard, mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS), P()),
            out_specs=(P(), P(), P()),
            check_rep=False)
    return jax.jit(mapped, donate_argnums=(0, 1) if donate else ())


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_leading(mesh: Mesh, tree):
    def put(a):
        spec = P(DATA_AXIS, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)
