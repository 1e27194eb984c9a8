"""Device-mesh construction and named-sharding helpers.

Reference equivalent: the *entirety* of the reference's multi-device story is
a ``torch.nn.DataParallel`` wrap (src/Methods/Base/Renderer.py:20-38). Here the
TPU-native replacement is first-class: a 1-D (or 2-D ici x dcn) ``jax.sharding
.Mesh`` with rays / pixels / image tiles sharded over the ``data`` axis and
parameters replicated; multi-host via ``jax.distributed.initialize``.

All shardings are expressed as NamedSharding so jit inserts ICI collectives
automatically; no NCCL-style explicit communication is ever written by hand.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerficg_tpu.core.errors import ShardingError

__all__ = ['RenderMesh', 'make_mesh', 'make_multihost_mesh',
           'initialize_distributed', 'shard_rays_spec', 'replicated_spec']

DATA_AXIS = 'data'


def make_mesh(devices: Optional[Sequence] = None,
              num_devices: Optional[int] = None) -> Mesh:
    """1-D data mesh over available devices."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if num_devices is not None:
        if num_devices > len(devices):
            raise ShardingError(
                f'requested {num_devices} devices, only {len(devices)} available')
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_rays_spec() -> P:
    """Shard the leading (ray/pixel/tile) axis over the data mesh axis."""
    return P(DATA_AXIS)


def replicated_spec() -> P:
    return P()


class RenderMesh:
    """Owns the mesh + canonical shardings for a training/render session.

    Replaces ``BaseRenderingComponent.get``'s DataParallel wrap
    (reference: Renderer.py:20-38): rendering components receive a RenderMesh
    and express batch parallelism with ``jax.jit(..., in_shardings=...)``.
    """

    def __init__(self, devices: Optional[Sequence] = None,
                 num_devices: Optional[int] = None):
        self.mesh = make_mesh(devices, num_devices)

    @property
    def num_devices(self) -> int:
        return self.mesh.size

    def data_sharding(self, ndim: int = 1) -> NamedSharding:
        """NamedSharding splitting the leading axis across devices."""
        spec = P(DATA_AXIS, *([None] * (ndim - 1)))
        return NamedSharding(self.mesh, spec)

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def pad_divisible(self, n: int) -> int:
        """Round a batch size up so it divides evenly over devices."""
        d = self.num_devices
        return ((n + d - 1) // d) * d

    def shard_batch(self, tree):
        """Place a pytree of (N, ...) arrays with the leading axis sharded."""
        def _put(a):
            return jax.device_put(a, self.data_sharding(max(a.ndim, 1)))
        return jax.tree_util.tree_map(_put, tree)

    def replicate(self, tree):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, self.replicated()), tree)


ICI_AXIS = 'ici'
DCN_AXIS = 'dcn'

_distributed_initialized = False


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host entry: ``jax.distributed.initialize`` (SURVEY §5.8).

    With no arguments JAX auto-detects the cluster environment (TPU pod
    metadata / SLURM / GKE env vars); explicit values override. Safe to
    call on a single host — it becomes a no-op when no cluster environment
    exists. Returns the process count."""
    global _distributed_initialized
    if _distributed_initialized:
        return jax.process_count()
    try:
        if coordinator_address or num_processes or \
                jax.process_count() == 1 and _cluster_env_present():
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        _distributed_initialized = True
    except Exception as exc:  # pragma: no cover - needs a real cluster
        from nerficg_tpu.core.logging import Logger
        Logger.warning(f'jax.distributed.initialize failed: {exc}; '
                       f'continuing single-process')
    return jax.process_count()


def _cluster_env_present() -> bool:
    import os
    return any(k in os.environ for k in (
        'COORDINATOR_ADDRESS', 'JAX_COORDINATOR_ADDRESS',
        'SLURM_JOB_NUM_NODES', 'TPU_WORKER_HOSTNAMES'))


def make_multihost_mesh(ici_axis_size: Optional[int] = None) -> Mesh:
    """2-D (dcn, ici) mesh for multi-host training.

    The DCN (inter-host) axis indexes processes; the ICI axis the chips of
    each host, so collectives along ``ici`` ride the chip interconnect and
    only the ``dcn`` axis crosses hosts. Data parallelism shards batches
    over BOTH axes (flattened); parameter replication stays free.
    On one process this degrades to (1, n_local) and behaves like the 1-D
    mesh with an extra unit axis."""
    devices = jax.devices()
    n_proc = jax.process_count()
    per_host = len(devices) // n_proc
    if ici_axis_size is None:
        ici_axis_size = per_host
    if per_host % ici_axis_size != 0 and ici_axis_size != per_host:
        raise ShardingError(
            f'ici axis {ici_axis_size} must divide chips/host {per_host}')
    grid = np.asarray(devices).reshape(n_proc * (per_host // ici_axis_size),
                                       ici_axis_size)
    return Mesh(grid, (DCN_AXIS, ICI_AXIS))


def shard_rays_spec_2d() -> P:
    """Leading axis sharded over BOTH mesh axes (pure data parallelism on a
    (dcn, ici) mesh)."""
    return P((DCN_AXIS, ICI_AXIS))
