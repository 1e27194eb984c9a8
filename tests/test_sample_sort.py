"""Morton-ordered march view + differentiable block permutation
(ops/occupancy.march_rays morton=True, ops/sample_sort.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerficg_tpu.ops.occupancy import march_rays
from nerficg_tpu.ops.sample_sort import permute_block_channels


def _march(morton, seed=0, num_rays=64):
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * np.pi, num_rays)
    origins = np.stack([1.5 * np.cos(ang), np.zeros(num_rays),
                        1.5 * np.sin(ang)], -1).astype(np.float32)
    tgt = rng.uniform(-0.3, 0.3, (num_rays, 3)).astype(np.float32)
    d = tgt - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    grid = jnp.ones((32 ** 3,), bool)
    return march_rays(jnp.asarray(origins), jnp.asarray(d),
                      jnp.asarray([-0.5] * 3), jnp.asarray([0.5] * 3),
                      grid, 32, max_steps=64, sample_budget=2048,
                      rng=jax.random.PRNGKey(1), block=8, morton=morton)


class TestMortonMarch:
    def test_morton_view_is_a_block_permutation(self):
        m = _march(morton=True)
        blk = 8
        bb = m.positions.shape[0] // blk
        pos_ray = np.asarray(m.positions).reshape(bb, blk, 3)
        pos_m = np.asarray(m.positions_m).reshape(bb, blk, 3)
        perm = np.asarray(m.perm_to_morton)
        np.testing.assert_allclose(pos_m, pos_ray[perm], atol=1e-6)
        # inverse consistency
        inv = np.asarray(m.perm_to_ray)
        np.testing.assert_array_equal(perm[inv], np.arange(bb))

    def test_morton_keys_sorted(self):
        from nerficg_tpu.ops.hash_window import morton_sort_keys
        m = _march(morton=True)
        blk = 8
        bb = m.positions.shape[0] // blk
        first = m.positions_m.reshape(bb, blk, 3)[:, 0]
        unit = jnp.clip((first + 0.5), 0, 1 - 1e-6)
        keys = np.asarray(morton_sort_keys(unit))
        # The exact invariant: the compaction keys the marcher hands the
        # windowed encode are non-decreasing by construction.
        bkeys = np.asarray(m.block_keys_m)
        assert (np.diff(bkeys) >= 0).all()
        # Proxy check on sample positions: the compaction key is the morton
        # of the first PROBE point (mid-block fractions, not the first
        # jittered sample), so allow inversions at ties/block boundaries.
        n_valid = int(np.asarray(m.num_blocks))
        n_valid = min(n_valid, bb)
        frac = (np.diff(keys[:n_valid]) >= 0).mean()
        assert frac > 0.8, frac

    def test_default_march_has_no_morton_fields(self):
        m = _march(morton=False)
        assert m.positions_m is None and m.perm_to_ray is None


class TestPermuteBlockChannels:
    def test_roundtrip_and_gradient(self):
        m = _march(morton=True)
        blk = 8
        b = m.positions.shape[0]
        # route the morton-ordered x coordinate back to ray order
        ch_m = m.positions_m[:, 0][None]                       # (1, B)
        back = permute_block_channels(ch_m, blk, m.perm_to_ray,
                                      m.perm_to_morton)
        np.testing.assert_allclose(np.asarray(back[0]),
                                   np.asarray(m.positions[:, 0]), atol=1e-6)

        # gradient = transpose of the (linear) permutation
        x = jnp.asarray(np.random.default_rng(2).normal(size=(4, b)),
                        jnp.float32)
        cot = jnp.asarray(np.random.default_rng(3).normal(size=(4, b)),
                          jnp.float32)

        def f(v):
            return jnp.sum(permute_block_channels(
                v, blk, m.perm_to_ray, m.perm_to_morton) * cot)

        g = jax.grad(f)(x)
        d = jnp.asarray(np.random.default_rng(4).normal(size=(4, b)),
                        jnp.float32)
        lhs = float(jnp.vdot(g, d))
        rhs = float(jnp.vdot(cot, permute_block_channels(
            d, blk, m.perm_to_ray, m.perm_to_morton)))
        assert abs(lhs - rhs) < 1e-3 * max(abs(rhs), 1.0)
