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

__all__ = ['RenderMesh', 'make_mesh', 'shard_rays_spec', 'replicated_spec']

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
