"""MXU-factored hash-table gather/scatter: the TPU-native hash-grid engine.

Problem (measured on TPU v5e): XLA's gather/scatter of tiny (F=2) rows is
effectively serial (~80-140 ns/row), making tcnn-style hash encodings
(33M lookups/step) impossible to train — the CUDA reference relies on
atomicAdd hardware TPUs don't have (reference: tcnn via
src/Thirdparty/TinyCudaNN.py, SURVEY §2.12 N11).

TPU-native redesign: factor the one-hot gather matrix over a (row, lane)
decomposition of the table index, ``onehot(idx, T) = onehot(idx>>7, T/128)
⊗ onehot(idx&127, 128)``, turning both directions into full-width MXU
matmuls:

  forward:   C = A @ table          (M,R)x(R,128) -> rowwise-dot with B
  backward:  dtable = A^T @ (B*g)   (R,M)x(M,128)

A Pallas kernel generates the A/B one-hot tiles on the fly in VMEM (VPU
iota-compare), so HBM traffic is just idx + values — XLA's version
materializes the (M,128) one-hots in HBM and is ~10-30x slower. A pure-jnp
fallback with identical semantics runs on CPU/interpret for tests.

Layouts are transposed-M throughout ((rows, M) / (lanes, M)) so no kernel
transposes are needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['mxu_gather', 'mxu_scatter_add', 'gather_d', 'scatter_add_d',
           'TILE_M']

TILE_M = 8192   # max lookups per kernel step (multiple of 128)
LANES = 128


def _pick_tile(rows: int) -> int:
    """Largest tile whose (rows, tile) one-hot stays within ~4 MB of VMEM
    (bf16) so the kernel fits the scoped-VMEM budget at any table size."""
    tile = TILE_M
    while tile > 512 and rows * tile * 2 > 4 * 1024 * 1024:
        tile //= 2
    return tile


def _pad_m(x, axis, tile):
    m = x.shape[axis]
    padded = ((m + tile - 1) // tile) * tile
    if padded == m:
        return x, m
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, padded - m)
    return jnp.pad(x, pad), m


# =============================================================================
# Forward: gather rows  out[l, f, m] = table[l, f, idx[l, m] >> 7, idx & 127]
# =============================================================================

def _gather_kernel(idx_ref, table_ref, out_ref, *, num_features, rows,
                   tile, compute_dtype=jnp.bfloat16):
    idx = idx_ref[0, 0]                                     # (1, tile) int32
    hi = (idx >> 7).reshape(1, tile)
    lo = (idx & (LANES - 1)).reshape(1, tile)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (rows, tile), 0)
    a_t = (iota_r == hi).astype(compute_dtype)              # (R, tile)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, tile), 0)
    b_t = (iota_l == lo).astype(jnp.float32)                # (128, tile)
    for f in range(num_features):
        table = table_ref[0, f].astype(compute_dtype)       # (R, 128)
        # C_T[lam, m] = sum_r table[r, lam] * A_T[r, m]
        c_t = jax.lax.dot_general(
            table, a_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (128, TILE_M)
        out_ref[0, f] = jnp.sum(c_t * b_t, axis=0, keepdims=True)[0]


def _mxu_gather_pallas(idx: jnp.ndarray, table: jnp.ndarray,
                       compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """idx (L, M) int32, table (L, F, R, 128) -> out (L, F, M) float32."""
    levels, num_features, rows, lanes = table.shape
    assert lanes == LANES
    tile = _pick_tile(rows)
    idx_p, m = _pad_m(idx, 1, tile)
    m_padded = idx_p.shape[1]
    # (L, chunks, 1, tile): satisfies the "(..., 1, lane-multiple)" TPU
    # block-shape constraint while keeping one chunk per grid step.
    idx_4d = idx_p.reshape(levels, m_padded // tile, 1, tile)
    kernel = functools.partial(_gather_kernel, num_features=num_features,
                               rows=rows, tile=tile,
                               compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(levels, m_padded // tile),
        in_specs=[
            pl.BlockSpec((1, 1, 1, tile), lambda l, i: (l, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_features, rows, LANES), lambda l, i: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, num_features, tile), lambda l, i: (l, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((levels, num_features, m_padded),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(idx_4d, table)
    return out[:, :, :m]


def _mxu_gather_jnp(idx: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Reference/CPU path with identical semantics (plain per-row gather)."""
    levels, num_features, rows, lanes = table.shape
    flat = table.reshape(levels, num_features, rows * lanes)
    gathered = jax.vmap(lambda tab, ind: tab[:, ind])(flat, idx)  # (L, F, M)
    return gathered


def mxu_gather(idx: jnp.ndarray, table: jnp.ndarray,
               use_pallas: bool = True,
               compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Gather table rows by flat index.

    idx: (L, M) int32 in [0, R*128).
    table: (L, F, R, 128) float32.
    compute_dtype: matmul operand dtype — bf16 for hash features (values are
      small), f32 when exactness matters (e.g. log-transmittance offsets).
    Returns (L, F, M) float32.
    """
    if use_pallas and jax.default_backend() == 'tpu':
        return _mxu_gather_pallas(idx, table, compute_dtype)
    return _mxu_gather_jnp(idx, table)


# =============================================================================
# Backward: scatter-add  dtable[l, f, r, lam] += g[l, f, m] at idx[l, m]
# =============================================================================

def _scatter_kernel(idx_ref, g_ref, out_ref, *, num_features, rows,
                    tile, compute_dtype=jnp.bfloat16):
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    idx = idx_ref[0, 0]
    hi = (idx >> 7).reshape(1, tile)
    lo = (idx & (LANES - 1)).reshape(1, tile)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (rows, tile), 0)
    a_t = (iota_r == hi).astype(compute_dtype)              # (R, tile)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, tile), 0)
    b_t = (iota_l == lo).astype(jnp.float32)                # (128, tile)
    for f in range(num_features):
        g = g_ref[0, f].reshape(1, tile)                    # (1, tile)
        bg_t = (b_t * g).astype(compute_dtype)              # (128, tile)
        # dT[r, lam] = sum_m A_T[r, m] * Bg_T[lam, m]
        d_t = jax.lax.dot_general(
            a_t, bg_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (R, 128)
        out_ref[0, f] += d_t


def _mxu_scatter_pallas(idx: jnp.ndarray, g: jnp.ndarray, rows: int,
                        compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """idx (L, M), g (L, F, M) -> dtable (L, F, R, 128)."""
    levels, num_features, _ = g.shape
    tile = _pick_tile(rows)
    idx_p, m = _pad_m(idx, 1, tile)
    g_p, _ = _pad_m(g, 2, tile)
    # Padded entries must not contribute: zero their gradient.
    m_padded = idx_p.shape[1]
    if m_padded != m:
        mask = (jnp.arange(m_padded) < m).astype(g.dtype)
        g_p = g_p * mask[None, None, :]
    idx_4d = idx_p.reshape(levels, m_padded // tile, 1, tile)
    kernel = functools.partial(_scatter_kernel, num_features=num_features,
                               rows=rows, tile=tile,
                               compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(levels, m_padded // tile),
        in_specs=[
            pl.BlockSpec((1, 1, 1, tile), lambda l, i: (l, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_features, tile), lambda l, i: (l, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, num_features, rows, LANES),
                               lambda l, i: (l, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((levels, num_features, rows, LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(idx_4d, g_p)
    return out


def _mxu_scatter_jnp(idx: jnp.ndarray, g: jnp.ndarray, rows: int) -> jnp.ndarray:
    levels, num_features, m = g.shape
    size = rows * LANES

    def per_level(ind, grad):
        def per_feature(gf):
            return jnp.zeros((size,), gf.dtype).at[ind].add(gf)
        return jax.vmap(per_feature)(grad)

    out = jax.vmap(per_level)(idx, g)
    return out.reshape(levels, num_features, rows, LANES)


def mxu_scatter_add(idx: jnp.ndarray, g: jnp.ndarray, rows: int,
                    use_pallas: bool = True,
                    compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Transpose of mxu_gather: accumulate g into a zero table.

    idx: (L, M) int32; g: (L, F, M); returns (L, F, R, 128).
    """
    if use_pallas and jax.default_backend() == 'tpu':
        return _mxu_scatter_pallas(idx, g, rows, compute_dtype)
    return _mxu_scatter_jnp(idx, g, rows)


# =============================================================================
# Differentiable wrappers: gather and scatter-add are each other's transpose.
# =============================================================================

@functools.partial(jax.custom_vjp, nondiff_argnums=())
def gather_d(idx: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Differentiable f32 mxu_gather (gradient flows to ``table``)."""
    return mxu_gather(idx, table, compute_dtype=jnp.float32)


def _gather_d_fwd(idx, table):
    return gather_d(idx, table), (idx, table.shape)


def _gather_d_bwd(residuals, g):
    idx, table_shape = residuals
    rows = table_shape[2]
    return None, mxu_scatter_add(idx, g, rows, compute_dtype=jnp.float32)


gather_d.defvjp(_gather_d_fwd, _gather_d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def scatter_add_d(idx: jnp.ndarray, g: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Differentiable f32 mxu_scatter_add (gradient flows to ``g``)."""
    return mxu_scatter_add(idx, g, rows, compute_dtype=jnp.float32)


def _scatter_d_fwd(idx, g, rows):
    return scatter_add_d(idx, g, rows), idx


def _scatter_d_bwd(rows, idx, cot):
    return None, mxu_gather(idx, cot, compute_dtype=jnp.float32)


scatter_add_d.defvjp(_scatter_d_fwd, _scatter_d_bwd)
