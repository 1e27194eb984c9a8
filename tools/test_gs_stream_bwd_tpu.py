#!/usr/bin/env python3
"""TPU smoke test: channel-major composite_sorted fwd + stream backward vs
the jnp oracle on the real chip (interpret-mode coverage lives in
tests/test_gs_tiles_kernel.py; this validates the compiled Mosaic path —
dynamic 128-aligned lane slices, per-chunk (width, CH) transposes, and the
revisiting-block gradient accumulation)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from nerficg_tpu.ops import gs_tiles_kernel as gtk

TILES_X = 1000000
NUM_TILES = 5
K = 256


def make_stream(rng):
    keys = jax.random.split(rng, 6)
    counts = jnp.asarray([37, 0, K, 5, 60][:NUM_TILES], jnp.int32)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts)[:-1]])
    e = int(jnp.sum(counts))
    e_pad = (-(-(e + 3 * K) // K)) * K
    means = jax.random.uniform(keys[0], (e_pad, 2), minval=-4.0, maxval=20.0)
    conics = jnp.stack([
        jax.random.uniform(keys[1], (e_pad,), minval=0.05, maxval=0.3),
        jax.random.uniform(keys[2], (e_pad,), minval=-0.02, maxval=0.02),
        jax.random.uniform(keys[1], (e_pad,), minval=0.05, maxval=0.3)], -1)
    opac = jax.random.uniform(keys[3], (e_pad, 1), minval=0.05, maxval=0.9)
    colors = jax.random.uniform(keys[4], (e_pad, 3))
    depths = jax.random.uniform(keys[5], (e_pad, 1), minval=1.0, maxval=5.0)
    mat = jnp.concatenate([means, conics, opac, colors, depths,
                           jnp.zeros((e_pad, 6))], axis=1)
    return mat.T, starts, counts


def main():
    assert jax.default_backend() == 'tpu', jax.default_backend()
    mat, starts, counts = make_stream(jax.random.PRNGKey(0))
    ref = gtk._cs_jnp(mat, starts, counts, TILES_X, NUM_TILES, K)
    out, tacc = gtk._run_fused_fwd(mat, starts, counts, TILES_X, NUM_TILES,
                                   K, save_tacc=True)
    err = float(jnp.abs(out[:, :5] - ref[:, :5]).max())
    print(f'fwd max err: {err:.2e}')
    assert err < 1e-4, err

    dout = jax.random.normal(jax.random.PRNGKey(5), (NUM_TILES, 8, gtk.P))

    def loss_ref(sm):
        return jnp.sum(gtk._cs_jnp(sm, starts, counts, TILES_X, NUM_TILES,
                                   K) * dout)

    dref = jax.grad(loss_ref)(mat)
    d = gtk._run_fused_bwd_stream(mat, starts, counts, dout, TILES_X,
                                  NUM_TILES, K, tacc=tacc)
    gerr = float(jnp.abs(d - dref).max())
    rel = gerr / (float(jnp.abs(dref).max()) + 1e-12)
    print(f'bwd max abs err: {gerr:.2e} (rel {rel:.2e})')
    assert rel < 1e-2, (gerr, rel)
    print('OK')


if __name__ == '__main__':
    main()
