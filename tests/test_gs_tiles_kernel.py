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


class TestCompositeSorted:
    """Fused slice+composite over the sorted stream (interpret mode)."""

    def _stream(self, rng, num_tiles=5, k=128):
        keys = jax.random.split(rng, 6)
        counts = jnp.asarray([37, 0, k, 5, 60][:num_tiles], jnp.int32)
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(counts)[:-1]])
        e = int(jnp.sum(counts))
        e_pad = (-(-(e + 3 * k) // k)) * k
        means = jax.random.uniform(keys[0], (e_pad, 2), minval=-4.0,
                                   maxval=20.0)
        conics = jnp.stack([
            jax.random.uniform(keys[1], (e_pad,), minval=0.05, maxval=0.3),
            jax.random.uniform(keys[2], (e_pad,), minval=-0.02, maxval=0.02),
            jax.random.uniform(keys[1], (e_pad,), minval=0.05, maxval=0.3)],
            -1)
        opac = jax.random.uniform(keys[3], (e_pad, 1), minval=0.05,
                                  maxval=0.9)
        colors = jax.random.uniform(keys[4], (e_pad, 3))
        depths = jax.random.uniform(keys[5], (e_pad, 1), minval=1.0,
                                    maxval=5.0)
        mat = jnp.concatenate([means, conics, opac, colors, depths,
                               jnp.zeros((e_pad, 6))], axis=1)
        return mat.T, starts, counts            # channel-major (16, E_pad)

    def test_fused_fwd_matches_fallback(self, rng):
        mat, starts, counts = self._stream(rng)
        ref = gtk._cs_jnp(mat, starts, counts, 1000000, 5, 128)
        with _interp():
            out = gtk._run_fused_fwd(mat, starts, counts, 1000000, 5, 128)
        np.testing.assert_allclose(np.asarray(out[:, :5]),
                                   np.asarray(ref[:, :5]), atol=1e-5)

    def test_stream_bwd_matches_fallback(self, rng):
        """Stream-accumulating backward (no routing sort) vs the oracle."""
        mat, starts, counts = self._stream(rng)
        dout = jax.random.normal(jax.random.PRNGKey(5), (5, 8, gtk.P))

        def loss_ref(sm):
            return jnp.sum(gtk._cs_jnp(sm, starts, counts, 1000000, 5, 128)
                           * dout)

        dref = jax.grad(loss_ref)(mat)
        with _interp():
            d = gtk._run_fused_bwd_stream(mat, starts, counts, dout,
                                          1000000, 5, 128)
        np.testing.assert_allclose(np.asarray(d), np.asarray(dref),
                                   atol=2e-3, rtol=1e-3)

    def test_fwd_save_tacc_matches_fallback(self, rng):
        """CH-aligned forward with saved per-chunk transmittance: same
        composite output, and the tacc residual feeds the backward."""
        mat, starts, counts = self._stream(rng)
        ref = gtk._cs_jnp(mat, starts, counts, 1000000, 5, 128)
        with _interp():
            out, tacc = gtk._run_fused_fwd(mat, starts, counts, 1000000,
                                           5, 128, save_tacc=True)
        np.testing.assert_allclose(np.asarray(out[:, :5]),
                                   np.asarray(ref[:, :5]), atol=1e-5)
        assert tacc.shape == (5, gtk._n_chunk_rows(128), gtk.P)

    def test_stream_bwd_with_tacc_matches_fallback(self, rng):
        """Pass-1-free stream backward (fed the forward's saved
        transmittance) vs the oracle gradients."""
        mat, starts, counts = self._stream(rng)
        dout = jax.random.normal(jax.random.PRNGKey(5), (5, 8, gtk.P))

        def loss_ref(sm):
            return jnp.sum(gtk._cs_jnp(sm, starts, counts, 1000000, 5, 128)
                           * dout)

        dref = jax.grad(loss_ref)(mat)
        with _interp():
            _, tacc = gtk._run_fused_fwd(mat, starts, counts, 1000000,
                                         5, 128, save_tacc=True)
            d = gtk._run_fused_bwd_stream(mat, starts, counts, dout,
                                          1000000, 5, 128, tacc=tacc)
        np.testing.assert_allclose(np.asarray(d), np.asarray(dref),
                                   atol=2e-3, rtol=1e-3)

    def test_custom_vjp_roundtrip_cpu(self, rng):
        mat, starts, counts = self._stream(rng)

        def loss(sm):
            return jnp.sum(gtk.composite_sorted(sm, starts, counts,
                                                1000000, 5, 128) ** 2)

        g = jax.grad(loss)(mat)
        assert g.shape == mat.shape
        assert bool(jnp.all(jnp.isfinite(g)))


def test_packed_stream_matches_unpacked(rng):
    """Inference packed-payload path vs the full-precision path (bf16 attr
    quantization tolerance)."""
    from nerficg_tpu.ops.gs_rasterize import rasterize_gaussians
    n = 300
    ks = jax.random.split(rng, 7)
    means2d = jnp.stack([jax.random.uniform(ks[0], (n,), maxval=64.0),
                         jax.random.uniform(ks[1], (n,), maxval=48.0)], -1)
    depths = jax.random.uniform(ks[2], (n,), minval=0.5, maxval=5.0)
    conics = jnp.stack([jnp.full((n,), 0.2), jnp.zeros(n),
                        jnp.full((n,), 0.2)], -1)
    radii = jnp.full((n,), 5.0)
    colors = jax.random.uniform(ks[3], (n, 3))
    opac = jax.random.uniform(ks[4], (n,), minval=0.2, maxval=0.9)
    vis = jnp.ones(n, bool)
    args = (means2d, depths, conics, radii, colors, opac, vis, 64, 48,
            jnp.zeros(3))
    full = rasterize_gaussians(*args, max_per_tile=128)
    packed = rasterize_gaussians(*args, max_per_tile=128,
                                 packed_inference=True)
    err = float(jnp.abs(full['rgb'] - packed['rgb']).max())
    assert err < 0.02, err
