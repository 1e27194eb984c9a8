"""Data model tests: ImageData, RayBatch pytree, View, PLY IO, datasets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerficg_tpu.cameras import PerspectiveCamera
from nerficg_tpu.core.config import ConfigNode
from nerficg_tpu.data.io import (flow_to_color, linear_to_srgb, load_image,
                                 read_flow, save_image, srgb_to_linear,
                                 write_flow)
from nerficg_tpu.data.ply import read_ply_vertices, write_ply_vertices
from nerficg_tpu.data.types import (AxisAlignedBox, BasicPointCloud, ImageData,
                                    RayBatch, View)


class TestImageIO:
    def test_save_load_roundtrip(self, tmp_path, np_rng):
        img = np_rng.random((16, 20, 3)).astype(np.float32)
        save_image(img, tmp_path / 'x.png')
        loaded = load_image(tmp_path / 'x.png')
        assert loaded.shape == (16, 20, 3)
        np.testing.assert_allclose(loaded, img, atol=1 / 255 + 1e-6)

    def test_scale_factor(self, tmp_path, np_rng):
        img = np_rng.random((32, 32, 3)).astype(np.float32)
        save_image(img, tmp_path / 'x.png')
        half = load_image(tmp_path / 'x.png', scale_factor=0.5)
        assert half.shape == (16, 16, 3)

    def test_flow_roundtrip(self, tmp_path, np_rng):
        flow = (np_rng.random((8, 12, 2)).astype(np.float32) - 0.5) * 10
        write_flow(flow, tmp_path / 'f.flo')
        back = read_flow(tmp_path / 'f.flo')
        np.testing.assert_allclose(back, flow, atol=1e-7)

    def test_flow_color(self):
        flow = np.zeros((4, 4, 2), np.float32)
        rgb = flow_to_color(flow)
        assert rgb.shape == (4, 4, 3)

    def test_srgb_roundtrip(self, np_rng):
        x = np_rng.random(100).astype(np.float64)
        np.testing.assert_allclose(linear_to_srgb(srgb_to_linear(x)), x,
                                   atol=1e-10)


class TestImageData:
    def test_lazy_load_and_channels(self, tmp_path, np_rng):
        img = np_rng.random((8, 8, 4)).astype(np.float32)
        save_image(img, tmp_path / 'rgba.png')
        rgb = ImageData(path=tmp_path / 'rgba.png', channels=slice(0, 3))
        alpha = ImageData(path=tmp_path / 'rgba.png', channels=slice(3, 4))
        assert rgb.load().shape == (8, 8, 3)
        assert alpha.load().shape == (8, 8, 1)

    def test_prefetch_caches(self, tmp_path, np_rng):
        img = np_rng.random((4, 4, 3)).astype(np.float32)
        save_image(img, tmp_path / 'x.png')
        data = ImageData(path=tmp_path / 'x.png')
        data.prefetch()
        assert data._cache is not None
        data.release()
        assert data._cache is None

    def test_data_scale(self):
        data = ImageData(data=np.ones((2, 2, 1), np.float32))
        data.update_data_scale(0.5)
        np.testing.assert_allclose(data.load(), 0.5)

    def test_missing(self):
        assert not ImageData().exists()
        assert ImageData().load() is None


class TestRayBatch:
    def _batch(self, n=10):
        return RayBatch(origins=jnp.zeros((n, 3)),
                        directions=jnp.ones((n, 3)),
                        rgb=jnp.linspace(0, 1, n)[:, None] * jnp.ones((n, 3)))

    def test_pytree_roundtrip(self):
        b = self._batch()
        leaves, treedef = jax.tree_util.tree_flatten(b)
        b2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert isinstance(b2, RayBatch)
        assert len(b2) == 10

    def test_jit_through(self):
        b = self._batch()

        @jax.jit
        def f(batch):
            return batch.replace(origins=batch.origins + 1)

        out = f(b)
        assert float(out.origins[0, 0]) == 1.0

    def test_indexing_split_cat(self):
        b = self._batch(10)
        sub = b[2:5]
        assert len(sub) == 3
        parts = b.split(4)
        assert [len(p) for p in parts] == [4, 4, 2]
        merged = RayBatch.cat(parts)
        assert len(merged) == 10
        np.testing.assert_allclose(np.asarray(merged.rgb), np.asarray(b.rgb))

    def test_pad(self):
        b = self._batch(5)
        p = b.pad_to(8)
        assert len(p) == 8
        assert float(p.origins[7, 0]) == 0.0

    def test_shape_validation(self):
        from nerficg_tpu.core.errors import DatasetError
        with pytest.raises(DatasetError):
            RayBatch(origins=jnp.zeros((5, 3)), directions=jnp.zeros((4, 3)))


class TestView:
    def test_rays_from_pose(self):
        cam = PerspectiveCamera(width=4, height=4)
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, -3]
        view = View(camera=cam, c2w=c2w)
        rays = view.get_rays()
        assert len(rays) == 16
        np.testing.assert_allclose(np.asarray(rays.origins), np.tile([0., 0., -3.], (16, 1)))
        # All rays point roughly toward +z.
        assert (np.asarray(rays.directions)[:, 2] > 0.5).all()

    def test_c2w_validation(self):
        cam = PerspectiveCamera(width=2, height=2)
        from nerficg_tpu.core.errors import DatasetError
        with pytest.raises(DatasetError):
            View(camera=cam, c2w=np.eye(3))
        v = View(camera=cam, c2w=np.eye(4)[:3])  # (3,4) ok
        assert v.c2w.shape == (4, 4)

    def test_project_unproject(self, np_rng):
        cam = PerspectiveCamera(width=32, height=32, focal_x=30.0)
        c2w = np.eye(4)
        c2w[:3, 3] = [1.0, -2.0, 0.5]
        view = View(camera=cam, c2w=c2w)
        pts = np_rng.random((10, 3)) + np.array([1, -2, 3])
        screen = view.project_points(pts)
        back = view.unproject_points(screen[:, :2], screen[:, 2])
        np.testing.assert_allclose(back, pts, atol=1e-3)


class TestPly:
    def test_vertices_roundtrip(self, tmp_path, np_rng):
        props = {'x': np_rng.random(10).astype(np.float32),
                 'y': np_rng.random(10).astype(np.float32),
                 'z': np_rng.random(10).astype(np.float32),
                 'red': (np_rng.random(10) * 255).astype(np.uint8)}
        write_ply_vertices(props, tmp_path / 'p.ply')
        back = read_ply_vertices(tmp_path / 'p.ply')
        for key in props:
            np.testing.assert_allclose(back[key], props[key], atol=1e-6)

    def test_pointcloud_roundtrip(self, tmp_path, np_rng):
        pcd = BasicPointCloud(np_rng.random((20, 3)),
                              colors=np_rng.random((20, 3)))
        pcd.save_ply(tmp_path / 'c.ply')
        back = BasicPointCloud.from_ply(tmp_path / 'c.ply')
        np.testing.assert_allclose(back.positions, pcd.positions, atol=1e-6)
        np.testing.assert_allclose(back.colors, pcd.colors, atol=1 / 255 + 1e-6)


class TestGeometry:
    def test_aabb(self):
        box = AxisAlignedBox(np.array([[-1, -2, -3], [1, 2, 3]]))
        np.testing.assert_allclose(box.center, 0)
        np.testing.assert_allclose(box.size, [2, 4, 6])
        cube = box.cube()
        np.testing.assert_allclose(cube.size, [6, 6, 6])

    def test_pointcloud_outliers(self, np_rng):
        pts = np_rng.normal(size=(1000, 3))
        pts[0] = [100, 100, 100]
        pcd = BasicPointCloud(pts).filter_outliers(0.97)
        assert len(pcd) < 1000
        assert pcd.positions.max() < 50


class TestNeRFDataset:
    def test_load_synthetic(self, synthetic_dataset):
        from nerficg_tpu.core.registry import Datasets
        config = ConfigNode({'GLOBAL': {'DATASET_TYPE': 'NeRF'},
                             'DATASET': {'PATH': str(synthetic_dataset)}})
        ds = Datasets.get_dataset(config)
        assert len(ds.subsets['train']) == 8
        assert len(ds.subsets['test']) == 2
        view = ds.subsets['train'][0]
        assert view.rgb.shape == (24, 24, 3)
        assert view.alpha.shape == (24, 24, 1)
        # camera at radius 4 from origin
        assert np.linalg.norm(view.position) == pytest.approx(4.0, abs=1e-6)
        # rays point at the origin-ish
        rays = view.get_rays()
        center_ray = np.asarray(rays.directions).reshape(24, 24, 3)[12, 12]
        to_origin = -view.position / np.linalg.norm(view.position)
        assert np.dot(center_ray, to_origin) > 0.99

    def test_precompute_rays(self, synthetic_dataset):
        from nerficg_tpu.core.registry import Datasets
        config = ConfigNode({'DATASET': {'PATH': str(synthetic_dataset)}})
        ds = Datasets.get_dataset(config, name='NeRF')
        collection = ds.precompute_rays('train')
        assert len(collection.rays) == 8 * 24 * 24
        assert collection.rays.rgb is not None

    def test_precompute_rays_batched_matches_per_view(self, synthetic_dataset):
        """The shared-camera batched fast path must reproduce the per-view
        reference path bit-for-bit in structure and near-exactly in value."""
        from nerficg_tpu.core.registry import Datasets
        from nerficg_tpu.data.types import RayBatch
        config = ConfigNode({'DATASET': {'PATH': str(synthetic_dataset)}})
        ds = Datasets.get_dataset(config, name='NeRF')
        views = ds.subsets['train']
        batched = ds._precompute_rays_batched(views, views[0].camera)
        reference = RayBatch.cat([v.get_rays() for v in views])
        for field in ('origins', 'directions', 'view_directions', 'rgb',
                      'alpha', 'timestamps'):
            a, b = getattr(batched, field), getattr(reference, field)
            assert (a is None) == (b is None), field
            if a is not None:
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-5, err_msg=field)
        np.testing.assert_array_equal(np.asarray(batched.pixel_ids),
                                      np.asarray(reference.pixel_ids))
        np.testing.assert_array_equal(np.asarray(batched.view_ids),
                                      np.asarray(reference.view_ids))


class TestAllLoadersImportable:
    def test_all_registered_loaders_resolve(self):
        from nerficg_tpu.core.registry import Datasets
        for name in Datasets.options():
            cls = Datasets.get_class(name)
            assert hasattr(cls, 'load'), name
            # default parameters resolvable (Configurable MRO merge works)
            params = cls.default_parameters()
            assert 'PATH' in params, name


class TestColmapModel:
    def _write_text_model(self, root):
        import numpy as np
        (root / 'sparse').mkdir(parents=True)
        with open(root / 'sparse' / 'cameras.txt', 'w') as f:
            f.write('# comment\n1 PINHOLE 64 48 60.0 55.0 32.0 24.0\n')
        with open(root / 'sparse' / 'images.txt', 'w') as f:
            f.write('# comment\n1 1 0 0 0 0.5 -1.0 2.0 1 img_000.png\n'
                    '1 2 0.5\n')
        with open(root / 'sparse' / 'points3D.txt', 'w') as f:
            f.write('1 0.1 0.2 0.3 255 128 0 0.5 1 0\n')

    def test_text_model_roundtrip(self, tmp_path):
        import numpy as np
        from nerficg_tpu.data.colmap_model import read_colmap_model
        self._write_text_model(tmp_path)
        cameras, images, (pts, cols) = read_colmap_model(tmp_path / 'sparse')
        assert cameras[1].model == 'PINHOLE'
        intr = cameras[1].intrinsics()
        assert intr['focal_x'] == 60.0 and intr['center_y'] == 24.0
        img = images[1]
        assert img.name == 'img_000.png'
        c2w = img.c2w()
        # identity rotation -> c2w translation = -t
        np.testing.assert_allclose(c2w[:3, 3], [-0.5, 1.0, -2.0], atol=1e-12)
        np.testing.assert_allclose(pts[0], [0.1, 0.2, 0.3], atol=1e-6)
        np.testing.assert_allclose(cols[0], [1.0, 128 / 255, 0.0], atol=1e-6)

    def test_colmap_dataset_loads(self, tmp_path, np_rng):
        from nerficg_tpu.core.config import ConfigNode
        from nerficg_tpu.core.registry import Datasets
        from nerficg_tpu.data.io import save_image
        self._write_text_model(tmp_path)
        (tmp_path / 'images').mkdir()
        save_image(np_rng.random((48, 64, 3)).astype('float32'),
                   tmp_path / 'images' / 'img_000.png')
        cfg = ConfigNode({'DATASET': {'PATH': str(tmp_path), 'TEST_STEP': 0,
                                      'NORMALIZE_PCA': False}})
        ds = Datasets.get_dataset(cfg, name='Colmap')
        assert len(ds.subsets['train']) == 1
        view = ds.subsets['train'][0]
        assert view.camera.width == 64
        assert view.rgb.shape == (48, 64, 3)
        assert ds.point_cloud is not None and len(ds.point_cloud) == 1


class TestTexturedProbeScene:
    """Regression guards for the capacity quality probe
    (data/synthetic.py make_textured_scene).

    Round 4 lost a day to a probe whose sphere front surface sat INSIDE the
    Blender loader's near plane (2.0): the marcher could never sample the
    visible surface and every capacity A/B trained to ~10 dB. These tests
    pin (a) surface visibility beyond the near plane for every view and
    (b) exact ray<->pixel-color pairing through the loader (in the loader's
    rotated world frame)."""

    @pytest.fixture(scope='class')
    def textured(self, tmp_path_factory):
        from nerficg_tpu.core.config import ConfigNode
        from nerficg_tpu.core.registry import Datasets
        from nerficg_tpu.data.synthetic import make_textured_scene
        root = tmp_path_factory.mktemp('textured') / 'scene'
        root.mkdir()
        make_textured_scene(root, image_size=32, n_train=6, n_test=2)
        cfg = ConfigNode({'GLOBAL': {'METHOD_TYPE': 'InstantNGP',
                                     'DATASET_TYPE': 'NeRF',
                                     'RANDOM_SEED': 0},
                          'DATASET': {'PATH': str(root)},
                          'MODEL': {}, 'RENDERER': {}, 'TRAINING': {}})
        return Datasets.get_dataset(cfg)

    @staticmethod
    def _sphere_hits(view, radius=0.8):
        rays = view.get_rays(with_images=True)
        o = np.asarray(rays.origins).reshape(-1, 3)
        d = np.asarray(rays.directions).reshape(-1, 3)
        b = (d * o).sum(-1)
        disc = b * b - ((o * o).sum(-1) - radius * radius)
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        hit = (disc > 0) & (t > 0)
        return rays, o, d, t, hit

    def test_surface_beyond_near_plane(self, textured):
        near = float(textured.camera_settings.near)
        for split in ('train', 'test'):
            getattr(textured, split)()
            for view in textured.views:
                _, _, _, t, hit = self._sphere_hits(view)
                assert hit.any()
                assert float(t[hit].min()) > near + 0.05, (
                    f'{split} view: visible surface at t={t[hit].min():.2f} '
                    f'inside near plane {near}')

    def test_ray_color_pairing(self, textured):
        """Analytic texture color at each ray's hit point must match the
        pooled training rgb (catches pose-convention and flattening-order
        mismatches that mask-level checks cannot see)."""
        import math
        rng = np.random.default_rng(0)
        octaves = (3.0, 8.0, 14.0)
        dirs_oct = rng.normal(size=(len(octaves), 3, 3))
        dirs_oct /= np.linalg.norm(dirs_oct, axis=-1, keepdims=True)
        phases = rng.uniform(0, 2 * math.pi, size=(len(octaves), 3))
        light = np.array([0.5, 0.7, 0.5])
        light /= np.linalg.norm(light)

        def texture(p):
            c = np.full(p.shape[:-1] + (3,), 0.5)
            amp = 0.5
            for o, f in enumerate(octaves):
                amp *= 0.55
                for ch in range(3):
                    c[..., ch] += amp * np.sin(
                        2 * math.pi * f * (p @ dirs_oct[o, ch])
                        + phases[o, ch])
            return np.clip(c, 0.0, 1.0)

        # The loader rotates the world (Blender -> COLMAP); undo it to
        # evaluate the generator-frame texture.
        from nerficg_tpu.data.loaders.nerf import BLENDER_TO_COLMAP_WORLD
        w_inv = BLENDER_TO_COLMAP_WORLD[:3, :3].T
        col = textured.precompute_rays('train')
        rays = col.rays
        o = np.asarray(rays.origins)
        d = np.asarray(rays.directions)
        rgb = np.asarray(rays.rgb)
        al = np.asarray(rays.alpha).reshape(-1)
        b = (d * o).sum(-1)
        disc = b * b - ((o * o).sum(-1) - 0.8 ** 2)
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        hit = (disc > 0) & (t > 0)
        p_true = (o + d * t[:, None]) @ w_inv.T
        n_true = p_true / 0.8
        shade = 0.35 + 0.65 * np.maximum(n_true @ light, 0.0)
        pred = texture(p_true) * shade[:, None]
        m = hit & (al > 0.9)
        assert m.sum() > 200
        corr = np.corrcoef(pred[m].ravel(), rgb[m].ravel())[0, 1]
        assert corr > 0.9, f'ray/color pairing broken: corr={corr:.3f}'


class TestDynamicTexturedProbeScene:
    """Guards for the dynamic quality probe
    (data/synthetic.py make_dynamic_textured_scene): the translating
    opaque sphere must stay beyond the near plane at every timestamp, and
    timestamps must span [0, 1] through the D-NeRF loader."""

    @pytest.fixture(scope='class')
    def dyntex(self, tmp_path_factory):
        from nerficg_tpu.core.config import ConfigNode
        from nerficg_tpu.core.registry import Datasets
        from nerficg_tpu.data.synthetic import make_dynamic_textured_scene
        root = tmp_path_factory.mktemp('dyntex') / 'scene'
        root.mkdir()
        make_dynamic_textured_scene(root, image_size=32, n_train=8, n_test=2)
        cfg = ConfigNode({'GLOBAL': {'METHOD_TYPE': 'DNeRF',
                                     'DATASET_TYPE': 'DNeRF',
                                     'RANDOM_SEED': 0},
                          'DATASET': {'PATH': str(root)},
                          'MODEL': {}, 'RENDERER': {}, 'TRAINING': {}})
        return Datasets.get_dataset(cfg)

    def test_timestamps_span(self, dyntex):
        dyntex.train()
        ts = [float(v.timestamp) for v in dyntex.views]
        assert min(ts) == 0.0 and max(ts) == 1.0
        assert len(set(ts)) == len(ts)

    def test_moving_surface_beyond_near_plane(self, dyntex):
        import math
        near = float(dyntex.camera_settings.near)
        for split in ('train', 'test'):
            getattr(dyntex, split)()
            for view in dyntex.views:
                t_time = float(view.timestamp)
                # Generator frame center; the loader rotates the world, so
                # rotate the center the same way before intersecting.
                from nerficg_tpu.data.loaders.nerf import (
                    BLENDER_TO_COLMAP_WORLD)
                c_gen = np.array(
                    [0.35 * math.sin(2 * math.pi * t_time), 0.0, 0.0])
                c = BLENDER_TO_COLMAP_WORLD[:3, :3] @ c_gen
                rays = view.get_rays(with_images=True)
                o = np.asarray(rays.origins).reshape(-1, 3) - c
                d = np.asarray(rays.directions).reshape(-1, 3)
                b = (d * o).sum(-1)
                disc = b * b - ((o * o).sum(-1) - 0.8 ** 2)
                t = -b - np.sqrt(np.maximum(disc, 0.0))
                hit = (disc > 0) & (t > 0)
                assert hit.any()
                assert float(t[hit].min()) > near + 0.05
