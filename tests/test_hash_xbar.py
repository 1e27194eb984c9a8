"""Tests for the crossbar hash encode (ops/hash_xbar.py).

The Pallas kernels are validated in interpreter mode against the jnp oracle
(the oracle itself is checked against a numpy reference); the stochastic
path needs the TPU PRNG and is validated on-chip (see PERF_NOTES.md) plus
statistically via the CPU fallback semantics here.
"""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerficg_tpu.ops import hash_xbar as hx
from nerficg_tpu.ops.hashgrid import HashGridConfig

CFG = HashGridConfig(num_levels=4, features_per_level=2, log2_table_size=11,
                     base_resolution=4, target_resolution=64)


@pytest.fixture
def table(rng):
    full_r = CFG.table_size // 128
    return jax.random.normal(rng, (CFG.num_levels, 2, full_r, 128),
                             jnp.float32) * 0.1


@pytest.fixture
def positions():
    return jax.random.uniform(jax.random.PRNGKey(1), (257, 3), jnp.float32,
                              0.0, 0.999)


def _interp(monkey_target):
    orig = hx.pl.pallas_call

    def call(*a, **k):
        k['interpret'] = True
        k.pop('compiler_params', None)
        return orig(*a, **k)
    return mock.patch.object(hx.pl, 'pallas_call', call)


def _numpy_reference(table, positions):
    """Straight numpy trilinear hash encode with per-level dense/hash
    indexing, mirroring the reference semantics
    (/root/reference/src/Methods/InstantNGP/Model.py:58-81 via tcnn)."""
    res_m1, rows, dense, _ = hx.level_layout(CFG)
    t = np.asarray(table, np.float64)
    p = np.asarray(positions, np.float64)
    n = p.shape[0]
    out = np.zeros((n, CFG.num_levels * 2))
    for lvl in range(CFG.num_levels):
        scaled = p * res_m1[lvl]
        base = np.floor(scaled).astype(np.int64)
        frac = scaled - base
        res1 = int(res_m1[lvl]) + 2
        tab = t[lvl].reshape(2, -1)
        acc = np.zeros((n, 2))
        for cx in (0, 1):
            for cy in (0, 1):
                for cz in (0, 1):
                    c = base + np.array([cx, cy, cz])
                    if dense[lvl]:
                        idx = c[:, 0] + c[:, 1] * res1 + c[:, 2] * res1 ** 2
                    else:
                        u = c.astype(np.uint32)
                        h = u[:, 0] ^ (u[:, 1] * np.uint32(2654435761)) \
                            ^ (u[:, 2] * np.uint32(805459861))
                        idx = (h & np.uint32(rows[lvl] * 128 - 1)).astype(
                            np.int64)
                    w = np.prod(np.where([cx, cy, cz], frac, 1 - frac), -1)
                    # emulate the kernel's bf16 table read
                    vals = np.asarray(
                        jnp.asarray(tab[:, idx].T, jnp.float32).astype(
                            jnp.bfloat16).astype(jnp.float32), np.float64)
                    acc += w[:, None] * vals
        out[:, lvl * 2:lvl * 2 + 2] = acc
    return out


def test_jnp_oracle_matches_numpy(table, positions):
    ref = _numpy_reference(table, positions)
    out = np.asarray(hx._fwd_jnp(table, positions, CFG))
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_kernel_fwd_matches_oracle(table, positions):
    ref = hx._fwd_jnp(table, positions, CFG)
    with _interp(hx):
        out = hx._fwd_pallas(table, positions, CFG, None, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_kernel_bwd_matches_oracle(table, positions):
    g = jax.random.normal(jax.random.PRNGKey(2),
                          (positions.shape[0], CFG.num_levels * 2))
    dref = hx._bwd_jnp(table.shape, positions, g, CFG)
    with _interp(hx):
        dout = hx._bwd_pallas(table.shape, positions, g, CFG, None, False)
    np.testing.assert_allclose(np.asarray(dout), np.asarray(dref), atol=1e-3)


def test_custom_vjp_roundtrip(table, positions):
    """CPU path: grad through the public API matches the oracle scatter."""
    g = jnp.ones((positions.shape[0], CFG.num_levels * 2))

    def loss(tab):
        return jnp.sum(hx.hash_encode_xbar(tab, positions, CFG))

    dtab = jax.grad(loss)(table)
    dref = hx._bwd_jnp(table.shape, positions, g, CFG)
    np.testing.assert_allclose(np.asarray(dtab), np.asarray(dref), atol=1e-4)


def test_stochastic_cpu_fallback_is_exact(table, positions):
    """On non-TPU backends the stochastic entry point falls back to the
    exact encode (kernel PRNG is TPU-only)."""
    seed = jnp.asarray([[3]], jnp.int32)
    out = hx.hash_encode_xbar_stochastic(table, positions, seed, CFG)
    ref = hx.hash_encode_xbar(table, positions, CFG)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_dense_levels_are_collision_free():
    res_m1, rows, dense, r_max = hx.level_layout(CFG)
    # base res 4 -> 5^3 = 125 <= 2048 -> dense
    assert dense[0] == 1
    assert rows[0] == (5 ** 3 + 127) // 128
    # finest level 64 -> 65^3 > 2048 -> hashed at the pow2 cap
    assert dense[-1] == 0
    assert rows[-1] == CFG.table_size // 128


def test_level_gradient_isolation(table, positions):
    """Gradients for level l only touch level l's table."""
    def loss(tab):
        out = hx.hash_encode_xbar(tab, positions, CFG)
        return jnp.sum(out[:, 2:4])          # level 1 features only

    dtab = jax.grad(loss)(table)
    assert float(jnp.abs(dtab[0]).sum()) == 0.0
    assert float(jnp.abs(dtab[1]).sum()) > 0.0
    assert float(jnp.abs(dtab[2]).sum()) == 0.0
