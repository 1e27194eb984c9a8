"""Differentiable block permutation between ray order and morton order.

The marcher (ops/occupancy.march_rays with ``morton=True``) emits the
compacted sample stream twice: ray-ordered for compositing and morton-
ordered for the gen-3 windowed hash encode (ops/hash_window.py). Field
outputs computed on the morton stream must return to ray order — a pure
block-row permutation of the (sigma, rgb) channels.

Implementation: a plain XLA row gather ``mat[perm]``. The round-2 cost
model ("XLA row gather is serial/dead on TPU", PERF_NOTES.md) was measured
on 33.5M gathers of 2-float rows from 2^19-row tables; at THIS shape
(32k rows of 32 floats from a 32k-row table) the same gather measures
0.067 ms — 200x faster than the crossbar row-scan kernel it replaces
(12.98 ms isolated; the scan pays O(rows^2) VPU work while the gather
streams each row once). Keep gathers wide and tables small and they are
fine on TPU; the crossbar/MXU machinery remains the answer only for the
huge-table tiny-row regime of the hash encode.

The VJP routes cotangents through the inverse permutation (no scatter;
the reference's CUDA marcher N4 never reorders because its gathers are
free — csrc/raymarching.cu).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ['permute_block_channels']


@jax.custom_vjp
def _permute(perms: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """out = mat[perms[0]]; differentiable in ``mat``.

    perms: (2, N) int32 rows [forward perm, inverse perm] — stacked so the
    vjp can return one zero cotangent for them."""
    return mat[perms[0]]


def _permute_fwd(perms, mat):
    return mat[perms[0]], perms


def _permute_bwd(perms, g):
    # out[i] = mat[p[i]] with p a bijection -> d_mat[j] = g[p_inv[j]].
    return jnp.zeros_like(perms), g[perms[1]]


_permute.defvjp(_permute_fwd, _permute_bwd)


def permute_block_channels(channels: jnp.ndarray, block: int,
                           perm: jnp.ndarray,
                           perm_inv: jnp.ndarray) -> jnp.ndarray:
    """Reorder per-sample channels (C, B) by a BLOCK permutation.

    channels: (C, B) with B = num_blocks * block, blocks contiguous.
    perm/perm_inv: (B/block,) block permutation and its inverse
    (march.perm_to_ray / march.perm_to_morton for morton->ray routing).
    Differentiable in ``channels``."""
    c, b = channels.shape
    bb = b // block
    mat = channels.reshape(c, bb, block).transpose(1, 0, 2).reshape(
        bb, c * block)
    out = _permute(jnp.stack([perm, perm_inv]), mat)
    return out.reshape(bb, c, block).transpose(1, 0, 2).reshape(c, b)
