"""Two-level rank-compacted block bitfield (sub-linear occupancy probe).

Covers ops/xbar_gather.py build_block_bitfield / block_probe_cells and the
ops/occupancy.py block-probe wrappers, including the conservative overflow
contract and dense-vs-block renderer equivalence.

Reference equivalent: the 128^3 occupancy bitfield tests of the CUDA
marcher (/root/reference/src/Methods/InstantNGP/csrc/raymarching.cu:166-331).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerficg_tpu.ops.occupancy import (downsample_occupancy,
                                       downsample_occupancy_block,
                                       downsample_occupancy_cascaded,
                                       downsample_occupancy_cascaded_block,
                                       occupancy_probe_block_cascaded_xyz,
                                       occupancy_probe_block_xyz,
                                       occupancy_probe_cascaded_xyz)
from nerficg_tpu.ops.xbar_gather import (block_probe_cells,
                                         build_block_bitfield,
                                         occupancy_probe_xyz)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestBlockBitfield:

    def _random_flags(self, rng, res, num_grids=1, density=0.1):
        return rng.random(num_grids * res ** 3) < density

    @pytest.mark.parametrize('res', [16, 32])
    def test_matches_dense_flags(self, rng, res):
        flags = self._random_flags(rng, res)
        nb = (res // 8) ** 3
        table = build_block_bitfield(jnp.asarray(flags), res, cap_blocks=nb)
        cells = rng.integers(0, res, (3, 4096)).astype(np.int32)
        got = block_probe_cells(table, jnp.asarray(cells[0]),
                                jnp.asarray(cells[1]), jnp.asarray(cells[2]),
                                0, res, cap_blocks=nb)
        dense = flags.reshape(res, res, res)[cells[0], cells[1], cells[2]]
        np.testing.assert_array_equal(np.asarray(got), dense)

    def test_overflow_is_conservative(self, rng):
        """Blocks past the capacity report OCCUPIED (never skipped);
        blocks within capacity stay exact."""
        res = 32
        flags = self._random_flags(rng, res, density=0.5)
        cap = 8  # far fewer than the occupied blocks
        table = build_block_bitfield(jnp.asarray(flags), res, cap_blocks=cap)
        cells = rng.integers(0, res, (3, 8192)).astype(np.int32)
        got = np.asarray(block_probe_cells(
            table, jnp.asarray(cells[0]), jnp.asarray(cells[1]),
            jnp.asarray(cells[2]), 0, res, cap_blocks=cap))
        dense = flags.reshape(res, res, res)[cells[0], cells[1], cells[2]]
        b = res // 8
        blk = ((cells[0] >> 3) * b + (cells[1] >> 3)) * b + (cells[2] >> 3)
        block_occ = flags.reshape(b, 8, b, 8, b, 8).transpose(
            0, 2, 4, 1, 3, 5).reshape(b ** 3, -1).any(1)
        rank = np.cumsum(block_occ) - 1
        in_cap = block_occ[blk] & (rank[blk] < cap)
        # exact where within capacity
        np.testing.assert_array_equal(got[in_cap], dense[in_cap])
        # overflowed occupied blocks: always True (conservative)
        over = block_occ[blk] & (rank[blk] >= cap)
        assert got[over].all()
        # empty blocks: always False (the coarse bit still filters)
        assert not got[~block_occ[blk]].any()

    def test_multi_grid_indexing(self, rng):
        res, grids = 16, 3
        flags = self._random_flags(rng, res, num_grids=grids, density=0.15)
        nb = grids * (res // 8) ** 3
        table = build_block_bitfield(jnp.asarray(flags), res, cap_blocks=nb,
                                     num_grids=grids)
        cells = rng.integers(0, res, (3, 4096)).astype(np.int32)
        g = rng.integers(0, grids, 4096).astype(np.int32)
        got = np.asarray(block_probe_cells(
            table, jnp.asarray(cells[0]), jnp.asarray(cells[1]),
            jnp.asarray(cells[2]), jnp.asarray(g), res, cap_blocks=nb,
            num_grids=grids))
        dense = flags.reshape(grids, res, res, res)[
            g, cells[0], cells[1], cells[2]]
        np.testing.assert_array_equal(got, dense)


class TestOccupancyBlockWrappers:

    def test_downsample_block_matches_dense_probe(self, rng):
        res, march = 64, 32
        grid = (rng.random(res ** 3) * 0.2).astype(np.float32)
        dense_packed = downsample_occupancy(jnp.asarray(grid), res, march,
                                            0.1)
        nb = (march // 8) ** 3
        table = downsample_occupancy_block(jnp.asarray(grid), res, march,
                                           0.1, cap_blocks=nb)
        u = rng.random((3, 2048)).astype(np.float32)
        ref = occupancy_probe_xyz(dense_packed, jnp.asarray(u[0]),
                                  jnp.asarray(u[1]), jnp.asarray(u[2]),
                                  march)
        got = occupancy_probe_block_xyz(table, jnp.asarray(u[0]),
                                        jnp.asarray(u[1]), jnp.asarray(u[2]),
                                        march, cap_blocks=nb)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_cascaded_block_matches_dense_cascaded(self, rng):
        res, march, casc = 32, 16, 3
        grid = (rng.random(casc * res ** 3) * 0.2).astype(np.float32)
        packed = downsample_occupancy_cascaded(jnp.asarray(grid), res, march,
                                               0.1, casc)
        nb = casc * (march // 8) ** 3
        table = downsample_occupancy_cascaded_block(
            jnp.asarray(grid), res, march, 0.1, casc, cap_blocks=nb)
        center = jnp.zeros(3)
        max_half = 4.0
        p = (rng.random((3, 2048)).astype(np.float32) - 0.5) * 7.9
        ref = occupancy_probe_cascaded_xyz(
            packed, jnp.asarray(p[0]), jnp.asarray(p[1]), jnp.asarray(p[2]),
            center, max_half, march)
        got = occupancy_probe_block_cascaded_xyz(
            table, jnp.asarray(p[0]), jnp.asarray(p[1]), jnp.asarray(p[2]),
            center, max_half, march, casc, cap_blocks=nb)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestRendererProbeModes:

    def test_block_and_dense_render_identically(self):
        """PROBE_MODE='block' (ample capacity) must reproduce the dense
        probe's images exactly — same marching decisions, same samples."""
        from nerficg_tpu.core.config import ConfigNode
        from nerficg_tpu.core.registry import Methods

        outs = {}
        for mode in ('dense', 'block'):
            cfg = ConfigNode({
                'GLOBAL': {'METHOD_TYPE': 'InstantNGP', 'RANDOM_SEED': 0},
                'MODEL': {'SCALE': 1.0},
                'RENDERER': {'MAX_SAMPLES': 64, 'RAY_BATCH_SIZE': 256,
                             'AVG_SAMPLES_PER_RAY': 16,
                             'PROBE_MODE': mode},
                'TRAINING': {},
            })
            model = Methods.get_model(cfg)
            renderer = Methods.get_renderer(cfg, model)
            # half-occupied density grid (match the model's cascaded shape)
            res = int(model.GRID_RESOLUTION)
            casc = model.buffers['density_grid'].size // res ** 3
            g = np.zeros((casc, res, res, res), np.float32)
            g[:, : res // 2] = 1.0
            model.buffers['density_grid'] = jnp.asarray(g.reshape(-1))
            rng = jax.random.PRNGKey(0)
            o = jnp.stack([jnp.zeros(64), jnp.zeros(64),
                           jnp.full((64,), -2.0)], -1)
            d = jnp.stack([jnp.linspace(-0.3, 0.3, 64), jnp.zeros(64),
                           jnp.ones(64)], -1)
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            out = renderer._render_rays_impl(
                model.params, renderer.grid_binary(), o, d, rng,
                jnp.zeros(3), randomized=False)
            outs[mode] = np.asarray(out['rgb'])
        np.testing.assert_allclose(outs['block'], outs['dense'], atol=1e-6)
