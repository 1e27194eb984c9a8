"""Fused GS tile-compositing kernel vs the jnp oracle (interpret mode)."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerficg_tpu.ops import gs_tiles_kernel as gtk


@pytest.fixture
def tile_data(rng):
    t, k = 6, 128
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    means = jax.random.uniform(k1, (t, k, 2), minval=-4.0, maxval=20.0)
    conics = jnp.stack([
        jax.random.uniform(k2, (t, k), minval=0.05, maxval=0.3),
        jax.random.uniform(k3, (t, k), minval=-0.02, maxval=0.02),
        jax.random.uniform(k2, (t, k), minval=0.05, maxval=0.3)], -1)
    opac = jax.random.uniform(k3, (t, k), minval=0.05, maxval=0.9)
    colors = jax.random.uniform(k4, (t, k, 3))
    depths = jax.random.uniform(k4, (t, k), minval=1.0, maxval=5.0)
    slots = jnp.concatenate(
        [means, conics, opac[..., None], colors, depths[..., None]], -1)
    counts = jnp.asarray([k, 0, 5, 64, k, 37], jnp.int32)
    origins = jnp.stack([jnp.arange(t, dtype=jnp.float32) * 16.0,
                         jnp.zeros(t)], -1)
    return slots, counts, origins


def _interp():
    orig = gtk.pl.pallas_call

    def call(*a, **kw):
        kw['interpret'] = True
        kw.pop('compiler_params', None)
        return orig(*a, **kw)
    return mock.patch.object(gtk.pl, 'pallas_call', call)


def test_fwd_kernel_matches_oracle(tile_data):
    slots, counts, origins = tile_data
    ref = gtk._composite_jnp(slots, counts, origins)
    with _interp():
        out = gtk._run_fwd(gtk._slots_to_rows(slots), counts,
                           1000000, slots.shape[1])
    np.testing.assert_allclose(np.asarray(out[:, :5]),
                               np.asarray(ref[:, :5]), atol=1e-5)


def test_bwd_kernel_matches_oracle_grads(tile_data):
    slots, counts, origins = tile_data
    dout = jax.random.normal(jax.random.PRNGKey(9),
                             (slots.shape[0], 8, gtk.P))

    def loss_ref(s):
        return jnp.sum(gtk._composite_jnp(s, counts, origins) * dout)

    dref = jax.grad(loss_ref)(slots)
    with _interp():
        dr = gtk._run_bwd(gtk._slots_to_rows(slots), counts,
                          1000000, dout, slots.shape[1])
    dslots = dr[:, :10].transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(dslots), np.asarray(dref),
                               atol=2e-3, rtol=1e-3)


def test_custom_vjp_cpu_fallback(tile_data):
    slots, counts, origins = tile_data

    def loss(s):
        return jnp.sum(gtk.composite_tiles(s, counts, origins,
                                           1000000) ** 2)

    g = jax.grad(loss)(slots)
    assert g.shape == slots.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    # padding gaussians past count must receive zero gradient
    assert float(jnp.abs(g[1]).sum()) == 0.0          # tile with count 0
    assert float(jnp.abs(g[2, 5:]).sum()) == 0.0      # beyond count 5
