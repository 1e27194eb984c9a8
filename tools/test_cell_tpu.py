#!/usr/bin/env python3
"""On-chip equivalence + timing for the gen-4 cell-packed encode.

Compares the Pallas kernels against the jnp oracle and times fwd/bwd at the
training operating point across capacities (the flat-scaling claim).  Run
on the TPU chip (the CI suite covers the oracle on CPU)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', str(Path.home() / '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)

from nerficg_tpu.ops.hashgrid import HashGridConfig
from nerficg_tpu.ops import hash_cell as hc
from nerficg_tpu.ops import hash_window as hw


def blocky_positions(n_blocks, blk, seed=0):
    """Marcher-like stream: morton-sorted short ray-segment blocks on a
    shell; returns (positions, anchor_keys)."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n_blocks, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    anchors = 0.5 + v * rng.uniform(0.28, 0.32, size=(n_blocks, 1))
    d = rng.normal(size=(n_blocks, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t = np.linspace(0.0, 0.0135, blk)[None, :, None]   # ~8 steps of 512
    pos = np.clip(anchors[:, None, :] + d[:, None, :] * t,
                  0.0, 1.0 - 1e-6).astype(np.float32)
    keys = np.asarray(hw.morton_sort_keys(jnp.asarray(
        anchors.clip(0.0, 1.0 - 1e-6).astype(np.float32))))
    order = np.argsort(keys)
    return (jnp.asarray(pos[order].reshape(-1, 3)),
            jnp.asarray(np.sort(keys), jnp.int32))


def timed(work, args, label, iters=30):
    @jax.jit
    def step(c, *a):
        out = work(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return c + leaf.ravel()[0].astype(jnp.float32) * 1e-20

    c = jnp.zeros(())
    c = step(c, *args)
    jax.block_until_ready(c)
    start = time.perf_counter()
    for _ in range(iters):
        c = step(c, *args)
    float(c)
    per = (time.perf_counter() - start - 0.027) / iters * 1000.0
    print(f'{label:48s} {per:8.3f} ms')
    return per


def main():
    # correctness at a small size, then timing at the operating point
    for log2ts in (14, 16, 19):
        cfg = HashGridConfig(num_levels=16, features_per_level=2,
                             log2_table_size=log2ts, base_resolution=16,
                             target_resolution=2048, anchor_stride=8)
        lay = hc.cell_layout(cfg)
        rows = max(br * 8 for br in lay.base_rows)
        table = jax.random.uniform(
            jax.random.PRNGKey(0), (cfg.num_levels, 2, rows, 128),
            jnp.float32, -1e-1, 1e-1)

        pos, ak = blocky_positions(2048, 8)
        pos_p, n = hc._prep(pos)
        akp = hc._prep_anchors(ak, pos.shape[0], pos_p.shape[0])
        lo, win = hc.cell_window_bases(pos_p, cfg, anchor_keys=akp)

        out_k = hc._fwd_pallas(table, pos_p, cfg, lo, win)
        out_o = hc._fwd_jnp(table, pos_p, cfg, lo, win)
        err = float(jnp.abs(out_k - out_o).max())
        print(f'2^{log2ts} fwd: kernel-vs-oracle max err {err:.2e}')
        assert err < 1e-4, 'forward mismatch'

        g = jax.random.normal(jax.random.PRNGKey(2), out_k.shape)
        dt_k = hc._bwd_pallas(table.shape, pos_p, g, cfg, lo, win)
        dt_o = hc._bwd_jnp(table.shape, pos_p, g, cfg, lo, win)
        # bf16 one-hot matmul value truncation, same regime as gen-3
        rerr = float(jnp.abs(dt_k - dt_o).max() /
                     (jnp.abs(dt_o).max() + 1e-9))
        print(f'2^{log2ts} bwd: rel err {rerr:.2e}')
        assert rerr < 5e-3, 'backward mismatch'

        # timing: 262144 samples as 32768 blocks of 8 (training op point)
        pos_b, ak_b = blocky_positions(32768, 8, seed=1)
        pos_bp, _ = hc._prep(pos_b)
        ak_bp = hc._prep_anchors(ak_b, pos_b.shape[0], pos_bp.shape[0])
        gb = jax.random.normal(jax.random.PRNGKey(3),
                               (cfg.output_dim, pos_b.shape[0]))

        def fwd(t, p, a):
            return hc.hash_encode_cell(t, p, cfg, a)

        def fwdbwd(t, p, a):
            def loss(tt):
                return jnp.sum(hc.hash_encode_cell(tt, p, cfg, a) ** 2)
            return jax.grad(loss)(t)

        timed(fwd, (table, pos_b, ak_b), f'2^{log2ts} cell fwd (262k)')
        timed(fwdbwd, (table, pos_b, ak_b), f'2^{log2ts} cell fwd+bwd (262k)')


if __name__ == '__main__':
    main()
