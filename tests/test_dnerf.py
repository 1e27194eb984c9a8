"""D-NeRF dynamic-scene method: deformation semantics + e2e smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerficg_tpu.core.config import ConfigNode
from nerficg_tpu.core.registry import Methods


def _make_trainer(**model_overrides):
    config = ConfigNode({
        'GLOBAL': {'METHOD_TYPE': 'DNeRF', 'RANDOM_SEED': 0,
                   'NUM_DEVICES': 1},
        'MODEL': {'GRID_RESOLUTION': 16, 'LOG2_HASHMAP_SIZE': 10,
                  'NUM_LEVELS': 4, 'DEFORM_WIDTH': 32, 'DEFORM_LAYERS': 2,
                  **model_overrides},
        'RENDERER': {'MAX_SAMPLES': 64, 'MARCH_RESOLUTION': 16,
                     'AVG_SAMPLES_PER_RAY': 16,
                     'INFERENCE_SAMPLES_PER_RAY': 32,
                     'RAY_BATCH_SIZE': 256, 'CARVE_OCCUPANCY': False},
        'TRAINING': {'INITIAL_RAYS_PER_BATCH': 256,
                     'TARGET_BATCH_SIZE': 4096,
                     'OCCUPANCY_WARMUP_STEPS': 0},
    })
    return Methods.get_training_instance(config)


def test_deformation_identity_at_t0(rng):
    trainer = _make_trainer()
    model = trainer.model
    pos = jax.random.uniform(rng, (32, 3), minval=-0.4, maxval=0.4)
    t0 = jnp.zeros(32)
    out = model.deform(model.params, pos, t0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pos), atol=1e-7)
    # zero-init output layer -> identity at every time initially
    t1 = jnp.full(32, 0.7)
    out1 = model.deform(model.params, pos, t1)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(pos), atol=1e-7)


def test_deformation_moves_after_perturbation(rng):
    trainer = _make_trainer()
    model = trainer.model
    ws = model.params['deform_mlp']
    ws[-1] = jnp.ones_like(ws[-1]) * 0.01
    pos = jax.random.uniform(rng, (16, 3), minval=-0.4, maxval=0.4)
    out0 = model.deform(model.params, pos, jnp.zeros(16))
    out1 = model.deform(model.params, pos, jnp.full(16, 0.5))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(pos), atol=1e-7)
    assert float(jnp.abs(out1 - pos).max()) > 1e-4


def test_render_rays_with_timestamps(rng):
    from nerficg_tpu.data.types import RayBatch
    trainer = _make_trainer()
    model, renderer = trainer.model, trainer.renderer
    model.buffers['density_grid'] = jnp.ones_like(
        model.buffers['density_grid'])
    n = 64
    origins = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -2.0]), (n, 3))
    d = jax.random.normal(rng, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = RayBatch(origins=np.asarray(origins), directions=np.asarray(d),
                    timestamps=np.linspace(0, 1, n)[:, None].astype(
                        np.float32))
    out = renderer.render_rays(rays)
    assert out['rgb'].shape == (n, 3)
    assert bool(jnp.all(jnp.isfinite(out['rgb'])))


@pytest.mark.slow
def test_trains_on_dynamic_synthetic_scene(rng):
    """A blob whose color flips with time: static fields cannot fit it,
    the deformation/canonical split can reduce the loss."""
    trainer = _make_trainer()
    model = trainer.model
    n_pool = 4096
    k1, k2 = jax.random.split(rng)
    origins = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -2.0]), (n_pool, 3))
    targets = jax.random.uniform(k1, (n_pool, 3), minval=-0.3, maxval=0.3)
    d = targets - origins
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    times = jax.random.uniform(k2, (n_pool, 1))
    rgb = jnp.where(times > 0.5, 0.9, 0.1) * jnp.ones((n_pool, 3))
    trainer._pool = {'origins': origins, 'directions': d, 'rgb': rgb,
                     'alpha': None, 'timestamps': times}
    trainer._pool_size = n_pool
    trainer._np_rng = np.random.default_rng(0)
    trainer._bg_static = jnp.zeros(3)
    trainer.renderer.bind_background(trainer._bg_static)
    trainer.opt_state = trainer.optimizer.init(model.params)
    model.buffers['density_grid'] = jnp.ones_like(
        model.buffers['density_grid'])

    losses = []
    for i in range(150):
        trainer.training_iteration(None, i)
        losses.append(float(trainer._last_logs['color']))
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])
    # the deformation field received gradient signal
    g = trainer.model.params['deform_mlp'][-1]
    assert float(jnp.abs(g).sum()) > 0.0


def test_dnerf_loader_and_cli_contract(dynamic_dataset):
    """Loader parses the D-NeRF format; views carry normalized timestamps."""
    from nerficg_tpu.core.config import ConfigNode
    from nerficg_tpu.core.registry import Datasets
    config = ConfigNode({'GLOBAL': {'DATASET_TYPE': 'DNeRF'},
                         'DATASET': {'PATH': str(dynamic_dataset)}})
    ds = Datasets.get_dataset(config)
    times = [v.timestamp for v in ds.train().views]
    assert min(times) == 0.0 and max(times) == 1.0
    rays = ds.precompute_rays('train').rays
    assert rays.timestamps is not None


def test_offset_prior_in_loss(rng):
    """The deformation offset prior is zero at init (identity warp) and
    positive once the warp is perturbed; it feeds the jitted loss via the
    _loss_extras hook."""
    trainer = _make_trainer()
    model = trainer.model
    term, logs = trainer._loss_extras(model.params, rng)
    assert float(term) == 0.0
    assert float(logs['offset_reg']) == 0.0
    params = dict(model.params)
    params['deform_mlp'] = list(params['deform_mlp'])
    params['deform_mlp'][-1] = jnp.ones_like(params['deform_mlp'][-1]) * 0.05
    term2, logs2 = trainer._loss_extras(params, rng)
    assert float(logs2['offset_reg']) > 0.0
    assert float(term2) == pytest.approx(
        float(trainer.OFFSET_REG_WEIGHT) * float(logs2['offset_reg']),
        rel=1e-6)


def test_deform_group_has_own_lr_schedule(rng):
    """The multi_transform optimizer drives deform_mlp with the exponential
    DEFORM_LR schedule and everything else with the multistep base LR."""
    trainer = _make_trainer()
    model = trainer.model
    opt_state = trainer.optimizer.init(model.params)
    grads = jax.tree_util.tree_map(jnp.ones_like, model.params)
    updates, _ = trainer.optimizer.update(grads, opt_state, model.params)
    # Adam normalizes the first update to ~lr in magnitude.
    up_deform = float(jnp.abs(updates['deform_mlp'][0]).mean())
    up_base = float(jnp.abs(updates['density_mlp'][0]).mean())
    assert up_deform == pytest.approx(float(trainer.DEFORM_LR), rel=1e-2)
    assert up_base == pytest.approx(float(trainer.LR), rel=1e-2)


def test_dnerf_optimizer_state_roundtrip(rng):
    """multi_transform state survives the trainer's flatten/unflatten resume
    path (set_optimizer_state rebuilds from the template treedef)."""
    trainer = _make_trainer()
    model = trainer.model
    opt_state = trainer.optimizer.init(model.params)
    grads = jax.tree_util.tree_map(jnp.ones_like, model.params)
    _, opt_state = trainer.optimizer.update(grads, opt_state, model.params)
    leaves = jax.tree_util.tree_leaves(opt_state)
    trainer.set_optimizer_state(leaves)
    new_leaves = jax.tree_util.tree_leaves(trainer.opt_state)
    assert len(leaves) == len(new_leaves)
    for a, b in zip(leaves, new_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
