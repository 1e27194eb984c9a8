"""Gen-3 windowed sorted-stream hash encode (ops/hash_window.py).

CPU tests pin the jnp oracle (the public entry's non-TPU path); the Pallas
kernels are validated against the same oracle on the chip
(tools/test_window_tpu.py) so the oracle is the single source of truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerficg_tpu.ops.hashgrid import HashGridConfig
from nerficg_tpu.ops import hash_window as hw


def _cfg(log2ts=14, levels=8, target=512):
    return HashGridConfig(num_levels=levels, features_per_level=2,
                          log2_table_size=log2ts, base_resolution=16,
                          target_resolution=target)


def _table(cfg, rng):
    lay = hw.window_layout(cfg)
    return jax.random.uniform(rng, (cfg.num_levels, 2, lay.r_max, 128),
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
        lay = hw.window_layout(_cfg())
        for lv in range(len(lay.res)):
            rows = lay.rows[lv]
            assert rows <= lay.r_max
            if lay.dense[lv]:
                # dense levels hold every vertex
                assert rows * 128 >= lay.res[lv] ** 3
            else:
                # hash rows power-of-two, rpb consistent with brick bits
                assert rows & (rows - 1) == 0
                nb = round(lay.bscale[lv] * lay.res[lv])
                assert nb & (nb - 1) == 0
                assert lay.rpb[lv] * nb ** 3 == rows

    def test_rows_and_lanes_in_range(self):
        cfg = _cfg()
        lay = hw.window_layout(cfg)
        pos = _sorted_positions(2048)
        rows, lanes, w = hw._corner_rows_lanes_jnp(pos, cfg)
        for lv in range(len(lay.res)):
            assert int(rows[lv].min()) >= 0
            assert int(rows[lv].max()) < lay.rows[lv]
            assert int(lanes[lv].min()) >= 0
            assert int(lanes[lv].max()) < 128
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)

    def test_morton_keys_monotone_in_each_dim(self):
        base = jnp.asarray([[0.3, 0.4, 0.5]])
        k0 = int(hw.morton_sort_keys(base)[0])
        for d in range(3):
            stepped = base.at[0, d].add(0.25)
            assert int(hw.morton_sort_keys(stepped)[0]) > k0


class TestWindows:
    def test_windows_cover_base_rows(self):
        """Every sample's base-vertex row lies inside its window (hash
        levels may wrap corners, but the base row must be covered for the
        window to make sense)."""
        cfg = _cfg()
        lay = hw.window_layout(cfg)
        pos = _sorted_positions(20000)
        pos_p, _ = hw._prep(pos)
        lo, win = hw.window_bases(pos_p, cfg)
        sb_n = hw.SUB_BLOCK * 128
        for lv in range(len(lay.res)):
            res = lay.res[lv]
            v = jnp.clip((pos_p * (res - 1)).astype(jnp.int32), 0, res - 1)
            row, _ = hw._row_lane(v[:, 0], v[:, 1], v[:, 2], res,
                                  lay.dense[lv], lay.bscale[lv],
                                  max(lay.rpb[lv], 1))
            rb = np.asarray(row).reshape(-1, sb_n)
            lo_l, win_l = np.asarray(lo[lv]), np.asarray(win[lv])
            inside = (rb >= lo_l[:, None]) & (rb < (lo_l + win_l)[:, None])
            # dense levels: all inside; hash levels: the quantization sliver
            # may push a tiny fraction outside (wrapped at encode time)
            frac = inside.mean()
            assert frac > (0.999 if lay.dense[lv] else 0.95), \
                f'level {lv}: {frac}'
            assert (lo_l % 8 == 0).all()
            assert (lo_l + win_l <= lay.rows[lv]).all()

    def test_dense_windows_cover_all_corners(self):
        cfg = _cfg()
        lay = hw.window_layout(cfg)
        pos = _sorted_positions(20000)
        pos_p, _ = hw._prep(pos)
        lo, win = hw.window_bases(pos_p, cfg)
        rows, _, _ = hw._corner_rows_lanes_jnp(pos_p, cfg)
        sb_n = hw.SUB_BLOCK * 128
        for lv in range(len(lay.res)):
            if not lay.dense[lv]:
                continue
            rb = np.asarray(rows[lv]).reshape(-1, sb_n, 8)
            lo_l, win_l = np.asarray(lo[lv]), np.asarray(win[lv])
            assert (rb >= lo_l[:, None, None]).all()
            assert (rb < (lo_l + win_l)[:, None, None]).all()

    def test_sorted_windows_much_tighter_than_full(self):
        cfg = _cfg(log2ts=14, levels=12, target=1024)
        lay = hw.window_layout(cfg)
        pos = _sorted_positions(100000)
        pos_p, _ = hw._prep(pos)
        lo, win = hw.window_bases(pos_p, cfg)
        w = np.asarray(win)
        # the finest bricked level must scan well below the full extent
        fine = len(lay.res) - 1
        assert not lay.dense[fine]
        assert w[fine].mean() < 0.5 * lay.rows[fine]


class TestOracle:
    def test_full_window_equals_plain_gather(self, rng):
        """With windows forced to the full extent the wrap is the identity,
        so the oracle must equal a direct (row, lane) gather."""
        cfg = _cfg(levels=4, target=128)
        lay = hw.window_layout(cfg)
        table = _table(cfg, rng)
        pos = _sorted_positions(1000)
        pos_p, n = hw._prep(pos)
        nsb = pos_p.shape[0] // (hw.SUB_BLOCK * 128)
        lo = jnp.zeros((4, nsb), jnp.int32)
        win = jnp.asarray([[lay.rows[lv]] * nsb for lv in range(4)],
                          jnp.int32)
        out = hw._fwd_jnp(table, pos_p, cfg, lo, win)[:, :n]

        rows, lanes, w = hw._corner_rows_lanes_jnp(pos_p, cfg)
        idx = rows * 128 + lanes
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
        g = jax.grad(lambda t: jnp.sum(hw.hash_encode_win(t, pos, cfg) *
                                       cot))(table)
        pos_p, n = hw._prep(pos)
        lo, win = hw.window_bases(pos_p, cfg)
        cot_p = jnp.pad(cot, ((0, 0), (0, pos_p.shape[0] - n)))
        ref = hw._bwd_jnp(table.shape, pos_p, cot_p, cfg, lo, win)
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                                   atol=1e-5, rtol=1e-4)

    def test_grad_numerical(self, rng):
        """Directional finite difference through the full custom_vjp."""
        cfg = _cfg(levels=3, target=64)
        table = _table(cfg, rng)
        pos = _sorted_positions(300)
        cot = jax.random.normal(jax.random.PRNGKey(4),
                                (cfg.output_dim, 300))
        direction = jax.random.normal(jax.random.PRNGKey(5), table.shape)

        def f(t):
            return jnp.sum(hw.hash_encode_win(t, pos, cfg) * cot)

        g = jax.grad(f)(table)
        analytic = float(jnp.vdot(g, direction))
        # The encode is LINEAR in the table, so a large step is exact up to
        # the bf16 table-read quantization (~0.4% of the perturbed values);
        # a small eps would measure quantization noise instead of the vjp.
        eps = 0.25
        numeric = float((f(table + eps * direction) -
                         f(table - eps * direction)) / (2 * eps))
        assert abs(analytic - numeric) < 0.05 * max(abs(numeric), 1.0)

    def test_stochastic_falls_back_exact_on_cpu(self, rng):
        cfg = _cfg(levels=4, target=128)
        table = _table(cfg, rng)
        pos = _sorted_positions(500)
        seed = jnp.asarray([[7]], jnp.int32)
        a = hw.hash_encode_win_stochastic(table, pos, seed, cfg, 2)
        b = hw.hash_encode_win(table, pos, cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_unsorted_inputs_still_correct(self, rng):
        """Sorting is a performance contract, not a correctness one."""
        cfg = _cfg(levels=4, target=128)
        table = _table(cfg, rng)
        pos_sorted = _sorted_positions(1200)
        perm = jax.random.permutation(jax.random.PRNGKey(9), 1200)
        pos_shuffled = pos_sorted[perm]
        a = hw.hash_encode_win(table, pos_shuffled, cfg)
        b = hw.hash_encode_win(table, pos_sorted, cfg)[:, perm]
        # windows differ between the two calls, so wrapped stragglers can
        # differ; demand agreement on the overwhelming majority
        close = np.isclose(np.asarray(a), np.asarray(b), atol=1e-5)
        assert close.mean() > 0.97
