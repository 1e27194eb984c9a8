"""Multi-cascade occupancy + exponential marching (unbounded scenes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerficg_tpu.ops.occupancy import (cascade_cell_positions,
                                       cascade_of_positions,
                                       downsample_occupancy_cascaded,
                                       march_rays, num_cascades,
                                       occupancy_probe_cascaded,
                                       update_density_grid)


def test_num_cascades():
    assert num_cascades(0.5) == 1
    assert num_cascades(1.0) == 2
    assert num_cascades(4.0) == 4
    assert num_cascades(8.0) == 5


def test_cascade_selection():
    center = jnp.zeros(3)
    # 3 cascades, max_half 2 -> half extents 0.5, 1, 2
    pos = jnp.asarray([[0.1, 0.0, 0.0],    # inner box -> 0
                       [0.0, 0.7, 0.0],    # needs half 1 -> 1
                       [1.5, 0.0, 0.0],    # needs half 2 -> 2
                       [5.0, 0.0, 0.0]])   # outside -> clamp 2
    c = cascade_of_positions(pos, center, 2.0, 3)
    np.testing.assert_array_equal(np.asarray(c), [0, 1, 2, 2])


def test_cascaded_probe_roundtrip(rng):
    res, cascades, max_half = 16, 3, 2.0
    center = jnp.zeros(3)
    density = (jax.random.uniform(rng, (cascades * res ** 3,)) > 0.5
               ).astype(jnp.float32)
    packed = downsample_occupancy_cascaded(density, res, res, 0.5, cascades)
    # cell-center positions reproduce their own occupancy bit
    cells = jnp.arange(cascades * res ** 3, dtype=jnp.int32)
    centers = cascade_cell_positions(cells, jnp.full((cells.shape[0], 3), 0.5),
                                     center, max_half, res, cascades)
    # NOTE: coarser cascades overlap finer ones; only test cells whose
    # centers select their own cascade (the outer shell of each level).
    sel = cascade_of_positions(centers, center, max_half, cascades)
    own = sel == (cells // res ** 3)
    probe = occupancy_probe_cascaded(packed, centers, center, max_half, res)
    match = jnp.where(own, probe == (density > 0.5), True)
    assert bool(jnp.all(match))


def test_exponential_march_spacing():
    origins = jnp.asarray([[0.0, 0.0, -3.0]])
    dirs = jnp.asarray([[0.0, 0.0, 1.0]])
    grid = jnp.ones(16 ** 3, bool)
    m = march_rays(origins, dirs, jnp.full(3, -4.0), jnp.full(3, 4.0),
                   grid, 16, max_steps=64, sample_budget=64, block=8,
                   exponential=True)
    ts = np.asarray(m.ts)[np.asarray(m.valid)]
    ratios = ts[1:] / ts[:-1]
    # geometric spacing: near-constant ratio > 1
    assert np.all(ratios > 1.0)
    assert np.std(ratios) < 0.05
    # deltas consistent with consecutive t differences
    deltas = np.asarray(m.deltas)[np.asarray(m.valid)]
    np.testing.assert_allclose(deltas[:-1], np.diff(ts), rtol=1e-3)


def test_carve_mask_blocks_updates(rng):
    res = 8
    grid = jnp.zeros(res ** 3)
    mask = jnp.zeros(res ** 3).at[:res ** 3 // 2].set(1.0)

    new = update_density_grid(
        grid, lambda p: jnp.ones(p.shape[0]), jnp.full(3, -1.0),
        jnp.full(3, 1.0), res, rng, num_samples=res ** 3, warmup=True,
        carve_mask=mask)
    carved = np.asarray(new)
    # warmup visits every cell once; carved cells must stay empty
    visible = np.asarray(mask) > 0.5
    assert np.all(carved[~visible] == 0.0)
    assert np.all(carved[visible] > 0.0)


def test_unbounded_model_renders(rng):
    from nerficg_tpu.core.config import ConfigNode
    from nerficg_tpu.core.registry import Methods
    config = ConfigNode({
        'GLOBAL': {'METHOD_TYPE': 'InstantNGP'},
        'MODEL': {'SCALE': 2.0, 'GRID_RESOLUTION': 16,
                  'LOG2_HASHMAP_SIZE': 10, 'NUM_LEVELS': 4},
        'RENDERER': {'MAX_SAMPLES': 64, 'MARCH_RESOLUTION': 16,
                     'INFERENCE_SAMPLES_PER_RAY': 32, 'RAY_BATCH_SIZE': 256},
        'TRAINING': {},
    })
    trainer = Methods.get_training_instance(config)
    model, renderer = trainer.model, trainer.renderer
    assert model.cascades == 3
    assert renderer._exponential
    model.buffers['density_grid'] = jnp.ones_like(
        model.buffers['density_grid'])
    from nerficg_tpu.data.types import RayBatch
    n = 64
    origins = jnp.zeros((n, 3)) + jnp.asarray([0.0, 0.0, -3.0])
    d = jax.random.normal(rng, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = RayBatch(origins=np.asarray(origins), directions=np.asarray(d))
    out = renderer.render_rays(rays)
    assert out['rgb'].shape == (n, 3)
    assert bool(jnp.all(jnp.isfinite(out['rgb'])))
