"""Gaussian Splatting method tests: model, surgery, end-to-end training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerficg_tpu.core.config import ConfigNode
from nerficg_tpu.data.types import BasicPointCloud
from nerficg_tpu.methods.gaussian_splatting.model import (DEAD_OPACITY_RAW,
                                                          GaussianSplattingModel)


def _tiny_model(n=64, capacity_granularity=128):
    model = GaussianSplattingModel(ConfigNode({'MODEL': {
        'SH_DEGREE': 2, 'CAPACITY_GRANULARITY': capacity_granularity}}))
    rng = np.random.default_rng(0)
    pcd = BasicPointCloud(rng.random((n, 3)).astype(np.float32) * 2 - 1,
                          rng.random((n, 3)).astype(np.float32))
    model.init_from_point_cloud(pcd)
    return model


class TestModel:
    def test_init_shapes_and_padding(self):
        model = _tiny_model(64, 128)
        assert model.num_active == 64
        assert model.params['positions'].shape == (128, 3)
        assert model.params['features_dc'].shape == (128, 1, 3)
        assert model.params['features_rest'].shape == (128, 3, 3)  # 2^2-1
        # Dead slots invisible.
        opac = np.asarray(model.get_opacities(model.params))
        assert (opac[64:] < 1e-5).all()
        assert (np.abs(opac[:64] - 0.1) < 1e-5).all()

    def test_scale_init_reflects_density(self):
        """Densely packed points get smaller initial scales."""
        rng = np.random.default_rng(0)
        dense = BasicPointCloud(rng.random((64, 3)).astype(np.float32) * 0.1)
        sparse = BasicPointCloud(rng.random((64, 3)).astype(np.float32) * 10)
        m1, m2 = _tiny_model(), _tiny_model()
        m1.init_from_point_cloud(dense)
        m2.init_from_point_cloud(sparse)
        s1 = float(np.asarray(m1.params['scales'][:64]).mean())
        s2 = float(np.asarray(m2.params['scales'][:64]).mean())
        assert s1 < s2

    def test_opacity_reset(self):
        model = _tiny_model()
        model.reset_opacity(0.01)
        opac = np.asarray(model.get_opacities(model.params))[:model.num_active]
        assert (opac <= 0.011).all()

    def test_ply_dict_layout(self):
        model = _tiny_model(16, 128)
        ply = model.get_ply_dict()
        assert set(ply) >= {'x', 'y', 'z', 'f_dc_0', 'opacity', 'scale_0',
                            'rot_0'}
        assert len(ply['x']) == 16

    def test_bake_sorts_and_prunes(self):
        model = _tiny_model(64, 128)
        # Kill half the gaussians.
        raw = np.array(model.params['opacities'])
        raw[:32] = DEAD_OPACITY_RAW
        model.params['opacities'] = jnp.asarray(raw)
        model.bake()
        assert model.num_active == 32

    def test_checkpoint_roundtrip(self, tmp_path):
        model = _tiny_model(64, 128)
        model.save(tmp_path / 'gs.ckpt')
        loaded = GaussianSplattingModel.load(tmp_path / 'gs.ckpt')
        assert loaded.num_active == 64
        np.testing.assert_allclose(np.asarray(loaded.params['positions']),
                                   np.asarray(model.params['positions']))


class TestDensification:
    def _opt_and_state(self, model):
        opt = optax.adam(1e-3)
        return opt, opt.init(model.params)

    def test_clone_on_high_gradient(self):
        model = _tiny_model(64, 128)
        opt, state = self._opt_and_state(model)
        capacity = model.params['positions'].shape[0]
        grads = np.zeros(capacity, np.float32)
        grads[:8] = 1.0  # 8 high-gradient gaussians (all small -> clone)
        counts = np.ones(capacity, np.float32)
        before = model.num_active
        model.densify_and_prune(state, grads, counts, grad_threshold=0.5,
                                scene_extent=100.0)
        assert model.num_active == before + 8

    def test_split_on_large_scale(self):
        model = _tiny_model(64, 128)
        # Make gaussian 0 large.
        scales = np.array(model.params['scales'])
        scales[0] = np.log(10.0)
        model.params['scales'] = jnp.asarray(scales)
        opt, state = self._opt_and_state(model)
        capacity = model.params['positions'].shape[0]
        grads = np.zeros(capacity, np.float32)
        grads[0] = 1.0
        model.densify_and_prune(state, grads, np.ones(capacity, np.float32),
                                grad_threshold=0.5, scene_extent=1.0)
        # Split: parent -> 2 children, both with shrunken scale.
        assert model.num_active == 65
        new_scales = np.exp(np.asarray(model.params['scales']))
        assert new_scales[:model.num_active].max() < 10.0

    def test_prune_low_opacity(self):
        model = _tiny_model(64, 128)
        raw = np.array(model.params['opacities'])
        raw[:10] = -10.0  # sigmoid ~ 4.5e-5 < 0.005
        model.params['opacities'] = jnp.asarray(raw)
        opt, state = self._opt_and_state(model)
        capacity = model.params['positions'].shape[0]
        model.densify_and_prune(state, np.zeros(capacity, np.float32),
                                np.ones(capacity, np.float32),
                                grad_threshold=0.5, scene_extent=1.0)
        assert model.num_active == 54

    def test_adam_state_follows_surgery(self):
        model = _tiny_model(64, 128)
        opt, state = self._opt_and_state(model)
        # Fake some moments.
        from nerficg_tpu.optim.state_surgery import (adam_moment_trees,
                                                     rebuild_adam_state)
        count, mu, nu = adam_moment_trees(state)
        mu = jax.tree_util.tree_map(lambda a: jnp.ones_like(a), mu)
        state = rebuild_adam_state(state, count, mu, nu)
        capacity = model.params['positions'].shape[0]
        grads = np.zeros(capacity, np.float32)
        grads[:4] = 1.0
        _, new_state = model.densify_and_prune(
            state, grads, np.ones(capacity, np.float32),
            grad_threshold=0.5, scene_extent=100.0)
        _, new_mu, _ = adam_moment_trees(new_state)
        new_capacity = model.params['positions'].shape[0]
        assert new_mu['positions'].shape == (new_capacity, 3)
        # Kept rows carry their moments; padding rows are zero.
        mu_np = np.asarray(new_mu['positions'])
        assert (mu_np[:model.num_active] == 1.0).all()
        assert (mu_np[model.num_active:] == 0.0).all()


class TestOpacityResetMoments:
    def test_reset_rows_zeroes_opacity_moments_multi_transform(self):
        """After an opacity reset the opacity group's Adam exp_avg/exp_avg_sq
        must be zero (reference: src/Optim/adam_utils.py:6-20) while other
        groups' moments survive — mirrors the trainer's multi_transform
        optimizer layout."""
        from nerficg_tpu.optim.state_surgery import reset_rows
        model = _tiny_model(64, 128)
        keys = list(model.params)
        opt = optax.multi_transform(
            {k: optax.adam(1e-3, eps=1e-15) for k in keys},
            param_labels={k: k for k in keys})
        state = opt.init(model.params)
        # One update to make the moments nonzero.
        grads = jax.tree_util.tree_map(jnp.ones_like, model.params)
        updates, state = opt.update(grads, state, model.params)

        def moments_of(s, key):
            out = []
            for item in jax.tree_util.tree_leaves(
                    s, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)):
                if isinstance(item, optax.ScaleByAdamState):
                    if isinstance(item.mu, dict) and hasattr(
                            item.mu.get(key, None), 'shape'):
                        out.append((np.asarray(item.mu[key]),
                                    np.asarray(item.nu[key])))
            return out

        assert any(np.abs(mu).sum() > 0 for mu, _ in moments_of(state,
                                                                'opacities'))
        mask = np.zeros(128, bool)
        mask[:model.num_active] = True
        state = reset_rows(state, mask, param_key='opacities')
        for mu, nu in moments_of(state, 'opacities'):
            assert np.abs(mu[:64]).sum() == 0 and np.abs(nu[:64]).sum() == 0
        assert any(np.abs(mu).sum() > 0
                   for mu, _ in moments_of(state, 'positions'))


class TestGaussianSplattingEndToEnd:
    @pytest.fixture(scope='class')
    def tiny_config(self):
        return ConfigNode({
            'GLOBAL': {'METHOD_TYPE': 'GaussianSplatting',
                       'DATASET_TYPE': 'NeRF', 'RANDOM_SEED': 0,
                       'LOG_LEVEL': 'SILENT'},
            'MODEL': {'SH_DEGREE': 2, 'CAPACITY_GRANULARITY': 1024},
            'RENDERER': {'MAX_PER_TILE': 64, 'TILE_CHUNK': 2},
            'TRAINING': {'NUM_ITERATIONS': 150, 'RANDOM_POINTS': 512,
                         'DENSIFY_FROM': 30, 'DENSIFY_UNTIL': 100,
                         'DENSIFY_INTERVAL': 50,
                         'OPACITY_RESET_INTERVAL': 10000,
                         'SH_UPDATE_INTERVAL': 50,
                         'RENDER_TESTSET': False,
                         'CHECKPOINT': {'FINAL': False},
                         'PRELOAD_DATASET': False},
        })

    def test_trains_on_synthetic_scene(self, tiny_config, synthetic_dataset,
                                       tmp_path):
        from nerficg_tpu.core.registry import Datasets, Methods
        from nerficg_tpu.core.setup import Directories
        Directories.base = tmp_path / 'output'
        dataset = Datasets.get_dataset(tiny_config, path=str(synthetic_dataset))
        trainer = Methods.get_training_instance(tiny_config)
        trainer.run(dataset)
        view = dataset.subsets['test'][0]
        out = trainer.renderer.render_image(view)
        pred = np.asarray(out['rgb'])
        gt = view.rgb * view.alpha + \
            dataset.camera_settings.background_color * (1 - view.alpha)
        psnr = -10 * np.log10(max(float(np.mean((pred - gt) ** 2)), 1e-10))
        assert np.isfinite(pred).all()
        assert psnr > 14.0, f'GS end-to-end PSNR too low: {psnr:.2f}'


class TestBackupResume:
    def test_periodic_backup_and_lossless_resume(self, synthetic_dataset,
                                                 tmp_path):
        """A BACKUP.INTERVAL training-state file is written during training
        and a FRESH trainer resumes from it (reference: Trainer.py:94-111,
        172-180) — optimizer moments, sh degree and gaussian count intact."""
        from nerficg_tpu.core.registry import Datasets, Methods
        from nerficg_tpu.core.setup import Directories
        Directories.base = tmp_path / 'output'

        def make_config(num_iterations):
            return ConfigNode({
                'GLOBAL': {'METHOD_TYPE': 'GaussianSplatting',
                           'DATASET_TYPE': 'NeRF', 'RANDOM_SEED': 0,
                           'LOG_LEVEL': 'SILENT'},
                'MODEL': {'SH_DEGREE': 2, 'CAPACITY_GRANULARITY': 1024},
                'RENDERER': {'MAX_PER_TILE': 64, 'TILE_CHUNK': 2},
                'TRAINING': {'NUM_ITERATIONS': num_iterations,
                             'RANDOM_POINTS': 256,
                             'DENSIFY_FROM': 4, 'DENSIFY_UNTIL': 8,
                             'DENSIFY_INTERVAL': 4,
                             'OPACITY_RESET_INTERVAL': 10000,
                             'SH_UPDATE_INTERVAL': 5,
                             'BACKUP': {'INTERVAL': 10},
                             'RENDER_TESTSET': False,
                             'CHECKPOINT': {'FINAL': False},
                             'PRELOAD_DATASET': False},
            })

        cfg = make_config(12)
        dataset = Datasets.get_dataset(cfg, path=str(synthetic_dataset))
        trainer = Methods.get_training_instance(cfg)
        trainer.run(dataset)
        backup = trainer.output_dir / 'latest.train'
        assert backup.is_file(), 'periodic backup was never written'
        n_active = trainer.model.num_active
        sh = trainer.model.active_sh_degree

        cfg2 = make_config(14)
        trainer2 = Methods.get_training_instance(cfg2)
        trainer2.load_training_state(backup)
        assert trainer2.iteration == 11  # backup at iter 10 -> resume at 11
        trainer2.run(dataset)
        assert trainer2.model.num_iterations_trained == 14
        assert trainer2.model.num_active == n_active
        assert trainer2.model.active_sh_degree >= sh
        # Optimizer state was restored (nonzero moments exist).
        total_mu = sum(
            float(np.abs(np.asarray(item.mu['positions'])).sum())
            for item in jax.tree_util.tree_leaves(
                trainer2.opt_state,
                is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
            if isinstance(item, optax.ScaleByAdamState)
            and isinstance(item.mu, dict)
            and hasattr(item.mu.get('positions'), 'shape'))
        assert total_mu > 0


class TestChunkedFrontend:
    """The lax.map-chunked per-gaussian frontend (PROJECT_CHUNK) must match
    the single-shot path exactly — values AND gradients."""

    def _setup(self, chunk):
        from nerficg_tpu.core.registry import Methods
        from nerficg_tpu.data.types import BasicPointCloud
        cfg = ConfigNode({
            'GLOBAL': {'METHOD_TYPE': 'GaussianSplatting',
                       'RANDOM_SEED': 0, 'LOG_LEVEL': 'SILENT'},
            'MODEL': {'SH_DEGREE': 2, 'CAPACITY_GRANULARITY': 256},
            'RENDERER': {'MAX_PER_TILE': 64, 'PROJECT_CHUNK': chunk},
            'TRAINING': {},
        })
        model = Methods.get_model(cfg)
        rng = np.random.default_rng(3)
        pts = rng.random((600, 3)).astype(np.float32) * 2 - 1
        model.init_from_point_cloud(BasicPointCloud(pts, rng.random((600, 3))))
        renderer = Methods.get_renderer(cfg, model)
        return model, renderer

    def test_chunked_matches_single_shot(self):
        import jax
        outs = {}
        grads = {}
        for chunk in (0, 256):           # 0 disables chunking; 256 < padded N
            model, renderer = self._setup(chunk)
            params = model.params
            n = params['positions'].shape[0]
            offset = jnp.zeros((n, 2), jnp.float32)
            intrinsics = (60.0, 60.0, 32.0, 24.0, 64, 48)
            w2c = jnp.eye(4).at[2, 3].set(3.0)
            cam = jnp.asarray([0.0, 0.0, -3.0])

            def loss(p):
                out = renderer.render_impl(
                    p, offset, w2c, cam, intrinsics=intrinsics,
                    background=jnp.zeros(3), sh_degree=2)
                return jnp.sum(out['rgb'] ** 2), out

            (val, out), g = jax.value_and_grad(loss, has_aux=True)(params)
            outs[chunk] = np.asarray(out['rgb'])
            grads[chunk] = g
        np.testing.assert_allclose(outs[0], outs[256], atol=1e-5)
        for key in grads[0]:
            np.testing.assert_allclose(
                np.asarray(grads[0][key]), np.asarray(grads[256][key]),
                atol=1e-4, rtol=1e-3, err_msg=key)
