"""Instant-NGP tests: hash grid, occupancy marching, packed compositing, e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerficg_tpu.ops.hashgrid import HashGridConfig, hash_grid_encode, init_hash_grid
from nerficg_tpu.ops.occupancy import (composite_packed, march_rays,
                                       occupancy_lookup, update_density_grid)


class TestHashGrid:
    def _config(self):
        return HashGridConfig(num_levels=4, features_per_level=2,
                              log2_table_size=10, base_resolution=4,
                              target_resolution=32)

    def test_shapes(self, rng):
        cfg = self._config()
        table = init_hash_grid(rng, cfg)
        assert table.shape == (4, 1024, 2)
        pos = jax.random.uniform(rng, (100, 3))
        out = hash_grid_encode(table, pos, cfg)
        assert out.shape == (100, cfg.output_dim)

    def test_interpolation_continuity(self, rng):
        """Nearby points give nearby features (trilinear interp)."""
        cfg = self._config()
        table = init_hash_grid(rng, cfg)
        p = jnp.array([[0.5, 0.5, 0.5]])
        a = hash_grid_encode(table, p, cfg)
        b = hash_grid_encode(table, p + 1e-5, cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    def test_gradients_reach_table(self, rng):
        cfg = self._config()
        table = init_hash_grid(rng, cfg)
        pos = jax.random.uniform(rng, (50, 3))

        def f(t):
            return jnp.sum(hash_grid_encode(t, pos, cfg) ** 2)

        g = jax.grad(f)(table)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.sum(jnp.abs(g))) > 0

    def test_deterministic(self, rng):
        cfg = self._config()
        table = init_hash_grid(rng, cfg)
        pos = jax.random.uniform(rng, (10, 3))
        a = hash_grid_encode(table, pos, cfg)
        b = hash_grid_encode(table, pos, cfg)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resolution_growth(self):
        cfg = HashGridConfig(num_levels=16, base_resolution=16,
                             target_resolution=2048)
        res = cfg.level_resolutions()
        assert res[0] == 16
        assert res[-1] in (2047, 2048)
        assert all(b >= a for a, b in zip(res, res[1:]))


class TestOccupancyMarching:
    def test_lookup(self):
        res = 8
        grid = jnp.zeros((res ** 3,), bool).at[0].set(True)
        # Cell 0 corresponds to coords (0,0,0) -> unit position near origin.
        hit = occupancy_lookup(grid, jnp.array([[0.01, 0.01, 0.01]]), res)
        miss = occupancy_lookup(grid, jnp.array([[0.9, 0.9, 0.9]]), res)
        assert bool(hit[0]) and not bool(miss[0])

    def _march_setup(self, full_grid=True, res=16):
        origins = jnp.array([[0.0, 0.0, -2.0]] * 4)
        directions = jnp.array([[0.0, 0.0, 1.0]] * 4)
        grid = jnp.full((res ** 3,), full_grid)
        return origins, directions, grid, res

    def test_march_full_grid(self):
        origins, directions, grid, res = self._march_setup()
        march = march_rays(origins, directions,
                           jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
                           grid, res, max_steps=32, sample_budget=4 * 32)
        # Full occupancy -> every in-box step is a sample: 4 rays x 32 steps.
        assert int(march.num_valid) == 128
        # Positions along +z within the box.
        pos = np.asarray(march.positions[np.asarray(march.valid)])
        assert (np.abs(pos[:, 0]) < 1e-5).all()
        assert (pos[:, 2] >= -1.0 - 1e-5).all() and (pos[:, 2] <= 1.0 + 1e-5).all()
        # ts ascending within each ray.
        ts = np.asarray(march.ts[:32])
        assert (np.diff(ts) > 0).all()

    def test_march_empty_grid(self):
        origins, directions, grid, res = self._march_setup(full_grid=False)
        march = march_rays(origins, directions,
                           jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
                           grid, res, max_steps=32, sample_budget=128)
        assert int(march.num_valid) == 0
        assert not bool(march.valid.any())

    def test_march_half_grid_skips(self):
        """Only the z>0 half occupied -> roughly half the samples."""
        res = 16
        origins = jnp.array([[0.0, 0.0, -2.0]])
        directions = jnp.array([[0.0, 0.0, 1.0]])
        coords = np.arange(res ** 3)
        z = coords % res
        grid = jnp.asarray(z >= res // 2)
        march = march_rays(origins, directions,
                           jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
                           grid, res, max_steps=64, sample_budget=64)
        frac = int(march.num_valid) / 64
        assert 0.4 < frac < 0.6

    def test_budget_overflow_truncates(self):
        origins, directions, grid, res = self._march_setup()
        # Budget 64 = 2 blocks of 32: only the first 2 rays' samples fit.
        march = march_rays(origins, directions,
                           jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
                           grid, res, max_steps=32, sample_budget=64)
        assert int(march.num_valid) == 64
        assert march.positions.shape == (64, 3)
        complete = np.asarray(march.ray_complete)
        assert complete.tolist() == [True, True, False, False]


class TestPackedCompositing:
    def test_matches_dense_compositing(self, np_rng):
        """Packed segment compositing == dense padded compositing oracle."""
        from nerficg_tpu.ops.compositing import composite_rays
        res = 8
        R, S = 6, 16
        origins = jnp.asarray(np_rng.normal(size=(R, 3)) * 0.1 +
                              np.array([0, 0, -2.0]), jnp.float32)
        directions = np.zeros((R, 3), np.float32)
        directions[:, 2] = 1.0
        directions = jnp.asarray(directions)
        grid = jnp.ones((res ** 3,), bool)
        march = march_rays(origins, directions,
                           jnp.array([-1.0, -1.0, -1.0]),
                           jnp.array([1.0, 1.0, 1.0]),
                           grid, res, max_steps=S, sample_budget=R * S)
        sigma = jnp.asarray(np_rng.random(R * S).astype(np.float32) * 3)
        rgb = jnp.asarray(np_rng.random((R * S, 3)).astype(np.float32))
        bg = jnp.array([0.2, 0.4, 0.6])
        out = composite_packed(sigma, rgb, march, R, background=bg,
                               early_stop_eps=0.0)
        # Dense oracle: reshape packed (full grid -> all samples valid, ordered).
        dense = composite_rays(rgb.reshape(R, S, 3), sigma.reshape(R, S),
                               march.ts.reshape(R, S),
                               march.deltas.reshape(R, S), background=bg)
        np.testing.assert_allclose(np.asarray(out['rgb']),
                                   np.asarray(dense['rgb']), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out['alpha']),
                                   np.asarray(dense['alpha']), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out['depth']),
                                   np.asarray(dense['depth']), atol=1e-3)

    def test_matches_dense_with_interleaved_gaps(self, np_rng):
        """Non-contiguous valid samples (occupancy gaps INSIDE a block) must
        composite identically to the dense oracle — regression for the
        per-ray transmittance offset being summed over several runs."""
        from nerficg_tpu.ops.compositing import composite_rays
        res = 8
        R, S = 4, 16
        origins = jnp.asarray(np.tile([0.0, 0.0, -2.0], (R, 1)), jnp.float32)
        directions = jnp.asarray(np.tile([0.0, 0.0, 1.0], (R, 1)), jnp.float32)
        # Checkered occupancy along z -> every other sample is invalid.
        coords = np.arange(res ** 3)
        grid = jnp.asarray((coords % res) % 2 == 0)
        march = march_rays(origins, directions,
                           jnp.array([-1.0, -1.0, -1.0]),
                           jnp.array([1.0, 1.0, 1.0]),
                           grid, res, max_steps=S, sample_budget=R * S)
        valid = np.asarray(march.valid)
        assert valid.any() and not valid.all(), 'need interleaved validity'
        # Gaps must appear INSIDE the per-ray runs, not only at the ends.
        v0 = valid[:S]
        first, last = np.argmax(v0), S - 1 - np.argmax(v0[::-1])
        assert not v0[first:last + 1].all(), 'need an in-run gap'
        sigma = jnp.asarray(np_rng.random(R * S).astype(np.float32) * 3)
        rgb = jnp.asarray(np_rng.random((R * S, 3)).astype(np.float32))
        bg = jnp.array([0.2, 0.4, 0.6])
        out = composite_packed(sigma, rgb, march, R, background=bg,
                               early_stop_eps=0.0)
        dense = composite_rays(rgb.reshape(R, S, 3),
                               jnp.where(march.valid, sigma, 0.0).reshape(R, S),
                               march.ts.reshape(R, S),
                               march.deltas.reshape(R, S), background=bg)
        np.testing.assert_allclose(np.asarray(out['rgb']),
                                   np.asarray(dense['rgb']), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out['alpha']),
                                   np.asarray(dense['alpha']), atol=1e-4)

    def test_gradients_flow(self, np_rng):
        res = 8
        origins = jnp.array([[0.0, 0.0, -2.0]] * 2)
        directions = jnp.array([[0.0, 0.0, 1.0]] * 2)
        grid = jnp.ones((res ** 3,), bool)
        march = march_rays(origins, directions,
                           jnp.array([-1.0, -1.0, -1.0]),
                           jnp.array([1.0, 1.0, 1.0]),
                           grid, res, max_steps=8, sample_budget=16)

        def f(sigma):
            rgb = jnp.ones((16, 3)) * 0.5
            out = composite_packed(sigma, rgb, march, 2)
            return jnp.sum(out['rgb'])

        g = jax.grad(f)(jnp.ones(16) * 0.5)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestDensityGridUpdate:
    def test_warmup_full_refresh(self, rng):
        res = 8
        grid = jnp.zeros((res ** 3,))

        def query(positions):
            # Density 5 inside a small sphere at the origin.
            return jnp.where(jnp.linalg.norm(positions, axis=-1) < 0.3, 5.0, 0.0)

        new = update_density_grid(grid, query, jnp.array([-1.0, -1.0, -1.0]),
                                  jnp.array([1.0, 1.0, 1.0]), res, rng,
                                  num_samples=64, warmup=True)
        occupied = float(jnp.mean(new > 0.5))
        # Sphere of r=0.3 in box of side 2: ~1.4% of volume.
        assert 0.001 < occupied < 0.1

    def test_decay(self, rng):
        res = 4
        grid = jnp.ones((res ** 3,))

        def query(positions):
            return jnp.zeros(positions.shape[0])

        new = update_density_grid(grid, query, jnp.zeros(3), jnp.ones(3),
                                  res, rng, num_samples=8, decay=0.9)
        assert float(new.max()) <= 0.9 + 1e-6

    def test_occupied_bias_refreshes_occupied_cells_faster(self, rng):
        """The reference refreshes uniform + OCCUPIED cells each update
        (InstantNGP/Renderer.py:252-258); here the slab start is biased
        toward occupied bins. Occupied-region cells must be re-queried
        measurably more often than empty-region cells."""
        import jax

        res = 16
        total = res ** 3
        # occupied region = first 5% of the flat grid
        occ_n = total // 20
        grid = jnp.zeros((total,)).at[:occ_n].set(5.0)

        def query(positions):
            # large density so touched cells are identifiable via max-update
            return jnp.full(positions.shape[0], 100.0)

        counts = jnp.zeros((total,))
        key = rng
        for i in range(60):
            key, k = jax.random.split(key)
            new = update_density_grid(grid, query, jnp.zeros(3),
                                      jnp.ones(3), res, k,
                                      num_samples=total // 16,
                                      decay=1.0, occupied_bias=0.5,
                                      occupied_threshold=1.0)
            counts = counts + (new > 50.0)
        occ_rate = float(counts[:occ_n].mean())
        emp_rate = float(counts[occ_n:].mean())
        assert occ_rate > 1.5 * emp_rate, (occ_rate, emp_rate)


class TestInstantNGPEndToEnd:
    @pytest.fixture(scope='class')
    def tiny_config(self):
        from nerficg_tpu.core.config import ConfigNode
        return ConfigNode({
            'GLOBAL': {'METHOD_TYPE': 'InstantNGP', 'DATASET_TYPE': 'NeRF',
                       'RANDOM_SEED': 0, 'LOG_LEVEL': 'SILENT',
                       'NUM_DEVICES': 1},
            'MODEL': {'NUM_LEVELS': 8, 'LOG2_HASHMAP_SIZE': 14,
                      'BASE_RESOLUTION': 4, 'TARGET_RESOLUTION': 64,
                      'DENSITY_MLP_WIDTH': 32, 'COLOR_MLP_WIDTH': 32,
                      'GRID_RESOLUTION': 32, 'SCALE': 1.0},
            'RENDERER': {'MAX_SAMPLES': 64, 'AVG_SAMPLES_PER_RAY': 24,
                         'RAY_BATCH_SIZE': 1024,
                         'OCCUPANCY_SAMPLES': 4096},
            'TRAINING': {'NUM_ITERATIONS': 300, 'INITIAL_RAYS_PER_BATCH': 512,
                         'MAX_RAYS_PER_BATCH': 512, 'LR': 1e-2,
                         'TARGET_BATCH_SIZE': 16384,
                         'OCCUPANCY_WARMUP_STEPS': 3000,
                         'RANDOM_BACKGROUND': False,
                         'RENDER_TESTSET': False,
                         'CHECKPOINT': {'FINAL': False},
                         'PRELOAD_DATASET': False},
        })

    def test_carve_matches_per_view_oracle(self, tiny_config,
                                           synthetic_dataset, tmp_path):
        """The batched single-dispatch frustum carve (round 5: one jitted
        projection over stacked w2c matrices instead of ~6 eager device
        round trips per view) must reproduce the per-view projection loop."""
        from nerficg_tpu.core.registry import Datasets, Methods
        from nerficg_tpu.core.setup import Directories
        from nerficg_tpu.ops.occupancy import cascade_cell_positions
        Directories.base = tmp_path / 'output'
        dataset = Datasets.get_dataset(tiny_config,
                                       path=str(synthetic_dataset))
        trainer = Methods.get_training_instance(tiny_config)
        renderer = trainer.renderer
        views = dataset.train().views
        renderer.carve_occupancy_grid(views, dilate=0)
        got = np.asarray(renderer.model.buffers['carve_mask']).astype(bool)

        res = int(renderer.model.GRID_RESOLUTION)
        total = renderer._cascades * res ** 3
        centers = np.asarray(cascade_cell_positions(
            jnp.arange(total, dtype=jnp.int32),
            jnp.full((total, 3), 0.5), renderer.model.center,
            float(renderer.model.SCALE), res, renderer._cascades),
            np.float64)
        want = np.zeros(total, bool)
        for view in views:
            pix = view.project_points(centers)
            w, h = view.camera.width, view.camera.height
            margin = 0.1 * max(w, h)
            want |= (pix[:, 2] > 0) & \
                (pix[:, 0] > -margin) & (pix[:, 0] < w + margin) & \
                (pix[:, 1] > -margin) & (pix[:, 1] < h + margin)
        # f32-vs-f64 projection rounding may flip cells sitting exactly on
        # the frustum margin; demand identity away from that knife edge.
        diff = got != want
        assert diff.mean() < 0.005, f'carve mismatch: {diff.mean():.4f}'
        assert got.any()

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
        assert psnr > 16.0, f'InstantNGP end-to-end PSNR too low: {psnr:.2f}'


class TestMXUHashEncode:
    """The MXU-factored path must match the reference gather path exactly."""

    def _setup(self, rng):
        from nerficg_tpu.ops.hashgrid import (HashGridConfig,
                                              init_hash_grid_mxu)
        cfg = HashGridConfig(num_levels=4, features_per_level=2,
                             log2_table_size=10, base_resolution=4,
                             target_resolution=32)
        table_mxu = init_hash_grid_mxu(rng, cfg)     # (L, F, R, 128)
        # Equivalent (L, T, F) layout for the reference implementation.
        L, F, R, _ = table_mxu.shape
        table_ref = table_mxu.reshape(L, F, R * 128).transpose(0, 2, 1)
        return cfg, table_mxu, table_ref

    def test_forward_matches_reference(self, rng):
        import jax
        import jax.numpy as jnp
        from nerficg_tpu.ops.hashgrid import (hash_grid_encode,
                                              hash_grid_encode_mxu)
        cfg, table_mxu, table_ref = self._setup(rng)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (77, 3))
        out_mxu = hash_grid_encode_mxu(table_mxu, pos, cfg)
        out_ref = hash_grid_encode(table_ref, pos, cfg)
        np.testing.assert_allclose(np.asarray(out_mxu), np.asarray(out_ref),
                                   atol=1e-5)

    def test_gradient_matches_reference(self, rng):
        import jax
        import jax.numpy as jnp
        from nerficg_tpu.ops.hashgrid import (hash_grid_encode,
                                              hash_grid_encode_mxu)
        cfg, table_mxu, table_ref = self._setup(rng)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (50, 3))
        cot = jax.random.normal(jax.random.PRNGKey(2),
                                (50, cfg.output_dim))

        def loss_mxu(t):
            return jnp.sum(hash_grid_encode_mxu(t, pos, cfg) * cot)

        def loss_ref(t):
            return jnp.sum(hash_grid_encode(t, pos, cfg) * cot)

        g_mxu = jax.grad(loss_mxu)(table_mxu)        # (L, F, R, 128)
        g_ref = jax.grad(loss_ref)(table_ref)        # (L, T, F)
        L, F, R, _ = g_mxu.shape
        g_mxu_as_ref = g_mxu.reshape(L, F, R * 128).transpose(0, 2, 1)
        np.testing.assert_allclose(np.asarray(g_mxu_as_ref),
                                   np.asarray(g_ref), atol=1e-4, rtol=1e-4)

    def test_jit_grad_through_model_field(self, rng):
        """Whole-field gradient is finite and nonzero with the MXU encode."""
        import jax
        import jax.numpy as jnp
        from nerficg_tpu.core.config import ConfigNode
        from nerficg_tpu.methods.instant_ngp.model import InstantNGPModel
        model = InstantNGPModel(ConfigNode({'MODEL': {
            'NUM_LEVELS': 4, 'LOG2_HASHMAP_SIZE': 10, 'BASE_RESOLUTION': 4,
            'TARGET_RESOLUTION': 32, 'DENSITY_MLP_WIDTH': 16,
            'COLOR_MLP_WIDTH': 16, 'GRID_RESOLUTION': 16}}))
        model.build(rng)
        pos = jax.random.uniform(rng, (64, 3)) * 0.8 - 0.4
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (64, 1))

        def loss(p):
            sigma, rgb = model.field(p, pos, dirs)
            return jnp.sum(sigma) + jnp.sum(rgb)

        grads = jax.jit(jax.grad(loss))(model.params)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)
        assert float(jnp.abs(grads['hash_table']).sum()) > 0


class TestProgressiveInference:
    def test_refine_improves_truncated_rays(self, rng):
        """Dense scene + tiny base budget: the refine pass must recover
        rays the base pass truncated (static-shape alive-ray equivalent,
        reference Renderer.py:85-138)."""
        from nerficg_tpu.core.config import ConfigNode
        from nerficg_tpu.core.registry import Methods
        from nerficg_tpu.data.types import RayBatch

        def build(refine):
            cfg = ConfigNode({
                'GLOBAL': {'METHOD_TYPE': 'InstantNGP', 'RANDOM_SEED': 0},
                'MODEL': {'GRID_RESOLUTION': 16, 'LOG2_HASHMAP_SIZE': 10,
                          'NUM_LEVELS': 4},
                'RENDERER': {'MAX_SAMPLES': 64, 'MARCH_RESOLUTION': 16,
                             'INFERENCE_SAMPLES_PER_RAY': 8,
                             'INFERENCE_REFINE': refine,
                             'INFERENCE_REFINE_FRACTION': 1.0,
                             'INFERENCE_REFINE_FACTOR': 8,
                             'RAY_BATCH_SIZE': 256},
                'TRAINING': {},
            })
            return Methods.get_training_instance(cfg)

        t0 = build(False)
        t1 = build(True)
        for t in (t0, t1):
            t.model.buffers['density_grid'] = jnp.ones_like(
                t.model.buffers['density_grid']) * 50.0
            t.model.params = t0.model.params
        # fill the whole chunk so padding slack cannot absorb the budget
        n = (256 * 32) // 8
        origins = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -2.0]), (n, 3))
        d = jax.random.normal(rng, (n, 3)) * 0.1 + jnp.asarray([0, 0, 1.0])
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays = RayBatch(origins=np.asarray(origins), directions=np.asarray(d))
        base = t0.renderer.render_rays(rays)
        refined = t1.renderer.render_rays(rays)
        # dense occupancy at 8 samples/ray truncates: alpha far from opaque
        assert float(jnp.mean(base['alpha'])) < 0.9
        assert float(jnp.mean(refined['alpha'])) > \
            float(jnp.mean(base['alpha'])) + 0.05


def test_occupied_cell_centers():
    """Occupied-cell extraction behind the wandb occupancy 3D panel: every
    returned center must itself probe as occupied in the density grid."""
    from nerficg_tpu.core.config import ConfigNode
    from nerficg_tpu.core.registry import Methods
    cfg = ConfigNode({
        'GLOBAL': {'METHOD_TYPE': 'InstantNGP', 'RANDOM_SEED': 0},
        'MODEL': {'GRID_RESOLUTION': 16, 'LOG2_HASHMAP_SIZE': 10,
                  'NUM_LEVELS': 4, 'SCALE': 2.0},
        'RENDERER': {'MARCH_RESOLUTION': 16}, 'TRAINING': {},
    })
    trainer = Methods.get_training_instance(cfg)
    renderer = trainer.renderer
    model = trainer.model
    res = int(model.GRID_RESOLUTION)
    grid = np.zeros(model.buffers['density_grid'].shape, np.float32)
    # occupy one known cell per cascade at (res//2, res//2, res//2)
    local = (res // 2) * res * res + (res // 2) * res + (res // 2)
    occupied = [local + c * res ** 3 for c in range(model.cascades)]
    for cell in occupied:
        grid[cell] = 10.0 * renderer.density_threshold
    model.buffers['density_grid'] = jnp.asarray(grid)
    centers = renderer.occupied_cell_centers()
    assert centers.shape == (len(occupied), 3)
    # cascade half-extents scale by 2x per cascade; the finest cascade's
    # center cell must be near the model center
    dists = np.linalg.norm(centers - np.asarray(model.center), axis=1)
    assert dists.min() < float(model.SCALE) / 2 ** (model.cascades - 1)
