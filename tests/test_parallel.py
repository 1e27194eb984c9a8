"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY §4(e))."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerficg_tpu.parallel.data_parallel import (make_data_parallel_train_step,
                                                replicate, shard_leading)
from nerficg_tpu.parallel.mesh import RenderMesh, make_mesh


@pytest.fixture(scope='module')
def mesh():
    assert len(jax.devices()) >= 8, 'conftest must provide 8 virtual devices'
    return make_mesh(num_devices=8)


class TestMesh:
    def test_eight_devices(self, mesh):
        assert mesh.size == 8

    def test_render_mesh_shard_batch(self, mesh):
        rm = RenderMesh(num_devices=8)
        batch = {'x': jnp.arange(64.0).reshape(16, 4)}
        sharded = rm.shard_batch(batch)
        assert sharded['x'].sharding.is_fully_replicated is False

    def test_pad_divisible(self):
        rm = RenderMesh(num_devices=8)
        assert rm.pad_divisible(13) == 16
        assert rm.pad_divisible(16) == 16


class TestDataParallelStep:
    def _linear_grad_fn(self, params, batch, rng):
        def loss_fn(p):
            pred = batch['x'] @ p['w']
            loss = jnp.mean((pred - batch['y']) ** 2)
            return loss, {'loss': loss}
        (loss, logs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return (loss, logs), grads

    def test_matches_single_device(self, mesh):
        """8-way sharded step == single-device step on the same batch."""
        rng = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        params = {'w': jax.random.normal(k1, (4, 2))}
        batch = {'x': jax.random.normal(k2, (32, 4)),
                 'y': jax.random.normal(k3, (32, 2))}
        optimizer = optax.sgd(0.1)
        opt_state = optimizer.init(params)

        # Single-device reference.
        (_, _), grads = self._linear_grad_fn(params, batch, rng)
        updates, _ = optimizer.update(grads, opt_state, params)
        expected = optax.apply_updates(params, updates)

        # Sharded step (rng folding differs per shard but this grad_fn is
        # deterministic, so grads must match exactly up to mean-of-shards).
        step = make_data_parallel_train_step(mesh, self._linear_grad_fn,
                                             optimizer, donate=False)
        p_rep = replicate(mesh, params)
        s_rep = replicate(mesh, opt_state)
        b_shard = shard_leading(mesh, batch)
        new_params, _, logs = step(p_rep, s_rep, b_shard, rng)
        np.testing.assert_allclose(np.asarray(new_params['w']),
                                   np.asarray(expected['w']), atol=1e-5)

    def test_params_stay_replicated(self, mesh):
        params = {'w': jnp.ones((4, 2))}
        optimizer = optax.sgd(0.1)
        step = make_data_parallel_train_step(mesh, self._linear_grad_fn,
                                             optimizer, donate=False)
        batch = {'x': jnp.ones((16, 4)), 'y': jnp.zeros((16, 2))}
        new_params, _, _ = step(replicate(mesh, params),
                                replicate(mesh, optimizer.init(params)),
                                shard_leading(mesh, batch),
                                jax.random.PRNGKey(0))
        assert new_params['w'].sharding.is_fully_replicated


class TestInstantNGPDataParallel:
    def test_ingp_step_on_mesh(self, mesh, synthetic_dataset):
        """The flagship INGP train step runs SPMD over the virtual mesh."""
        from nerficg_tpu.core.config import ConfigNode
        from nerficg_tpu.core.registry import Methods
        cfg = ConfigNode({
            'GLOBAL': {'METHOD_TYPE': 'InstantNGP', 'RANDOM_SEED': 0},
            'MODEL': {'NUM_LEVELS': 4, 'LOG2_HASHMAP_SIZE': 10,
                      'BASE_RESOLUTION': 4, 'TARGET_RESOLUTION': 32,
                      'DENSITY_MLP_WIDTH': 16, 'COLOR_MLP_WIDTH': 16,
                      'GRID_RESOLUTION': 32, 'SCALE': 1.0},
            'RENDERER': {'MAX_SAMPLES': 32, 'AVG_SAMPLES_PER_RAY': 16,
                         'MARCH_RESOLUTION': 32},
        })
        model = Methods.get_model(cfg)
        renderer = Methods.get_renderer(cfg, model)
        optimizer = optax.adam(1e-2)

        rays_per_device = 32
        n = rays_per_device * 8

        def grad_fn(params, batch, rng):
            def loss_fn(p):
                out = renderer._render_rays_impl(
                    p, batch['grid'][0], batch['origins'],
                    batch['directions'], rng, jnp.zeros(3),
                    randomized=True, num_rays=rays_per_device,
                    samples_per_ray=16)
                loss = jnp.mean((out['rgb'] - batch['rgb']) ** 2)
                return loss, {'loss': loss}
            return jax.value_and_grad(loss_fn, has_aux=True)(params)

        step = make_data_parallel_train_step(mesh, grad_fn, optimizer,
                                             donate=False)
        rng = jax.random.PRNGKey(0)
        d = jax.random.normal(rng, (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        grid = renderer.grid_binary()
        batch = {
            'origins': jnp.zeros((n, 3)) + jnp.array([0.0, 0.0, -2.0]),
            'directions': d,
            'rgb': jax.random.uniform(rng, (n, 3)),
            # replicate the skip-grid by stacking one copy per device
            'grid': jnp.broadcast_to(grid[None], (8,) + grid.shape),
        }
        params, opt_state, logs = step(
            replicate(mesh, model.params),
            replicate(mesh, optimizer.init(model.params)),
            shard_leading(mesh, batch), rng)
        assert np.isfinite(float(logs['loss']))
        assert params['hash_table'].sharding.is_fully_replicated


class TestInstantNGPTrainerDP:
    def test_trainer_uses_dp_step(self, synthetic_dataset, tmp_path):
        """Full INGP trainer path with GLOBAL.NUM_DEVICES=8 on the CPU mesh."""
        from nerficg_tpu.core.config import ConfigNode
        from nerficg_tpu.core.registry import Datasets, Methods
        cfg = ConfigNode({
            'GLOBAL': {'METHOD_TYPE': 'InstantNGP', 'DATASET_TYPE': 'NeRF',
                       'RANDOM_SEED': 0, 'NUM_DEVICES': 8},
            'MODEL': {'NUM_LEVELS': 4, 'LOG2_HASHMAP_SIZE': 10,
                      'BASE_RESOLUTION': 4, 'TARGET_RESOLUTION': 32,
                      'DENSITY_MLP_WIDTH': 16, 'COLOR_MLP_WIDTH': 16,
                      'GRID_RESOLUTION': 32, 'SCALE': 1.0},
            'RENDERER': {'MAX_SAMPLES': 32, 'AVG_SAMPLES_PER_RAY': 16,
                         'MARCH_RESOLUTION': 32, 'OCCUPANCY_SAMPLES': 4096},
            'TRAINING': {'NUM_ITERATIONS': 4, 'INITIAL_RAYS_PER_BATCH': 256,
                         'TARGET_BATCH_SIZE': 4096,
                         'OCCUPANCY_WARMUP_STEPS': 100,
                         'RANDOM_BACKGROUND': False,
                         'PRELOAD_DATASET': False},
        })
        dataset = Datasets.get_dataset(cfg, path=str(synthetic_dataset))
        trainer = Methods.get_training_instance(cfg)
        trainer.output_dir = tmp_path
        trainer._init_samplers(dataset)
        trainer._warmup_occupancy(dataset)
        assert trainer._num_devices() == 8
        for it in range(3):
            trainer.training_iteration(dataset, it)
        assert np.isfinite(float(trainer._last_logs['total']))
        assert trainer.model.params['hash_table'].sharding.is_fully_replicated


class TestMultiHostMesh:
    def test_multihost_mesh_shape_single_process(self):
        from nerficg_tpu.parallel.mesh import (DCN_AXIS, ICI_AXIS,
                                               make_multihost_mesh)
        mesh = make_multihost_mesh()
        assert mesh.axis_names == (DCN_AXIS, ICI_AXIS)
        assert mesh.size == len(jax.devices())

    def test_2d_data_spec_shards_batch(self):
        import jax.numpy as jnp
        from jax.sharding import NamedSharding
        from nerficg_tpu.parallel.mesh import (make_multihost_mesh,
                                               shard_rays_spec_2d)
        mesh = make_multihost_mesh()
        x = jnp.arange(mesh.size * 4.0).reshape(mesh.size * 2, 2)
        sharded = jax.device_put(x, NamedSharding(mesh, shard_rays_spec_2d()))
        assert len(sharded.addressable_shards) == mesh.size
        # a jitted reduction over the sharded array works (collective path)
        assert float(jnp.sum(sharded)) == float(jnp.sum(x))

    def test_initialize_distributed_single_host_noop(self):
        from nerficg_tpu.parallel.mesh import initialize_distributed
        assert initialize_distributed() == jax.process_count()
