"""Differentiable block permutation between ray order and morton order.

The marcher (ops/occupancy.march_rays with ``morton=True``) emits the
compacted sample stream twice: ray-ordered for compositing and morton-
ordered for the gen-3 windowed hash encode (ops/hash_window.py). Field
outputs computed on the morton stream must return to ray order — a pure
block-row permutation of the (sigma, rgb) channels.

Why not ``lax.sort`` with the channels as payloads: payload-heavy sorts run
fine (~1 ms) but take MINUTES to compile on this stack (measured 494 s for a
26-operand sort), so the permutation is applied by the multi-channel
crossbar kernel ``ops.xbar_gather.xbar_permute`` instead, with a custom VJP
that routes cotangents through the inverse permutation (no scatter; the
reference's CUDA marcher N4 never reorders because its gathers are free).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nerficg_tpu.ops.xbar_gather import xbar_permute

__all__ = ['permute_block_channels']


@jax.custom_vjp
def _permute(perms: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """out = mat[perms[0]]; differentiable in ``mat``. Values move bit-exact
    as f32 (a bf16-paired transport halved the kernel scan but its strided
    pack/unpack relayouts cost 3x the saving in XLA glue — measured).

    perms: (2, N) int32 rows [forward perm, inverse perm] — stacked so the
    vjp can return one zero cotangent for them."""
    return xbar_permute(mat, perms[0])


def _permute_fwd(perms, mat):
    return xbar_permute(mat, perms[0]), perms


def _permute_bwd(perms, g):
    # out[i] = mat[p[i]] with p a bijection -> d_mat[j] = g[p_inv[j]].
    return jnp.zeros_like(perms), xbar_permute(g, perms[1])


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
