"""Gaussian-splatting rasterizer tests: projection, binning, compositing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerficg_tpu.ops.gaussian import (build_covariance_3d, project_gaussians,
                                      quaternion_to_rotation)
from nerficg_tpu.ops.gs_rasterize import (TILE, bin_gaussians,
                                          rasterize_gaussians)


class TestGaussianMath:
    def test_quaternion_identity(self):
        rot = quaternion_to_rotation(jnp.array([1.0, 0.0, 0.0, 0.0]))
        np.testing.assert_allclose(np.asarray(rot), np.eye(3), atol=1e-6)

    def test_covariance_isotropic(self):
        cov = build_covariance_3d(jnp.array([[0.5, 0.5, 0.5]]),
                                  jnp.array([[1.0, 0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(cov[0]), 0.25 * np.eye(3),
                                   atol=1e-6)

    def test_covariance_rotation_invariant_trace(self, np_rng):
        scales = jnp.asarray(np_rng.random((10, 3)).astype(np.float32) + 0.1)
        q = np_rng.normal(size=(10, 4)).astype(np.float32)
        q = jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))
        cov = build_covariance_3d(scales, q)
        np.testing.assert_allclose(
            np.trace(np.asarray(cov), axis1=-2, axis2=-1),
            np.sum(np.asarray(scales) ** 2, -1), rtol=1e-4)


class TestProjection:
    def _project_single(self, pos, scale=0.1):
        means = jnp.asarray([pos], jnp.float32)
        cov = build_covariance_3d(jnp.full((1, 3), scale),
                                  jnp.array([[1.0, 0.0, 0.0, 0.0]]))
        return project_gaussians(means, cov, jnp.eye(4), focal_x=50.0,
                                 focal_y=50.0, center_x=32.0, center_y=32.0,
                                 width=64, height=64)

    def test_center_projection(self):
        out = self._project_single([0.0, 0.0, 2.0])
        np.testing.assert_allclose(np.asarray(out['means2d'][0]), [32, 32],
                                   atol=1e-4)
        assert float(out['depths'][0]) == pytest.approx(2.0)
        assert bool(out['in_frustum'][0])
        assert float(out['radii'][0]) > 0

    def test_behind_camera_culled(self):
        out = self._project_single([0.0, 0.0, -2.0])
        assert not bool(out['in_frustum'][0])

    def test_off_screen_culled(self):
        out = self._project_single([100.0, 0.0, 2.0], scale=0.01)
        assert not bool(out['in_frustum'][0])

    def test_radius_shrinks_with_depth(self):
        near = self._project_single([0.0, 0.0, 1.0])
        far = self._project_single([0.0, 0.0, 8.0])
        assert float(near['radii'][0]) > float(far['radii'][0])


class TestBinning:
    def test_single_gaussian_single_tile(self):
        means2d = jnp.array([[8.0, 8.0]])   # center of tile 0
        tile_ids, counts = bin_gaussians(means2d, jnp.array([1.0]),
                                         jnp.array([2.0]), jnp.array([True]),
                                         width=32, height=32,
                                         max_per_tile=8)
        assert int(counts[0]) == 1
        assert int(tile_ids[0, 0]) == 0
        assert int(counts[1]) == 0

    def test_large_gaussian_spans_tiles(self):
        means2d = jnp.array([[16.0, 16.0]])  # at the corner of 4 tiles
        tile_ids, counts = bin_gaussians(means2d, jnp.array([1.0]),
                                         jnp.array([8.0]), jnp.array([True]),
                                         width=32, height=32, max_per_tile=8)
        assert np.asarray(counts)[:4].tolist() == [1, 1, 1, 1]

    def test_depth_ordering(self):
        means2d = jnp.array([[8.0, 8.0], [9.0, 9.0], [7.0, 7.0]])
        depths = jnp.array([3.0, 1.0, 2.0])
        tile_ids, counts = bin_gaussians(means2d, depths,
                                         jnp.full(3, 2.0), jnp.full(3, True),
                                         width=16, height=16, max_per_tile=8)
        assert int(counts[0]) == 3
        assert np.asarray(tile_ids[0, :3]).tolist() == [1, 2, 0]  # near->far

    def test_invisible_excluded(self):
        means2d = jnp.array([[8.0, 8.0]])
        _, counts = bin_gaussians(means2d, jnp.array([1.0]), jnp.array([2.0]),
                                  jnp.array([False]), width=16, height=16,
                                  max_per_tile=8)
        assert int(counts.sum()) == 0


class TestRasterize:
    def _raster_one(self, opacity=0.9, color=(1.0, 0.0, 0.0), sigma=3.0,
                    center=(16.5, 16.5), bg=(0.0, 0.0, 0.0), size=32):
        inv = 1.0 / (sigma * sigma)
        return rasterize_gaussians(
            means2d=jnp.array([list(center)]),
            depths=jnp.array([2.0]),
            conics=jnp.array([[inv, 0.0, inv]]),
            radii=jnp.array([3.0 * sigma]),
            colors=jnp.array([list(color)]),
            opacities=jnp.array([opacity]),
            visible=jnp.array([True]),
            width=size, height=size, background=jnp.asarray(bg),
            max_per_tile=8, tile_chunk=2)

    def test_gaussian_footprint(self):
        out = self._raster_one()
        img = np.asarray(out['rgb'])
        assert img.shape == (32, 32, 3)
        # Peak at the center, red channel; alpha = opacity at center.
        assert img[16, 16, 0] == pytest.approx(0.9, abs=0.02)
        assert img[16, 16, 1] == pytest.approx(0.0, abs=1e-5)
        center_alpha = float(np.asarray(out['alpha'])[16, 16, 0])
        assert center_alpha == pytest.approx(0.9, abs=0.02)
        # Falls off with distance following exp(-0.5 d^2/sigma^2).
        expected = 0.9 * np.exp(-0.5 * 36 / 9.0)
        assert img[16, 22, 0] == pytest.approx(expected, abs=0.02)

    def test_background_blend(self):
        out = self._raster_one(opacity=0.5, bg=(0.0, 0.0, 1.0))
        img = np.asarray(out['rgb'])
        # Center: 0.5 red + 0.5 blue bg.
        assert img[16, 16, 0] == pytest.approx(0.5, abs=0.02)
        assert img[16, 16, 2] == pytest.approx(0.5, abs=0.02)
        # Far corner: pure background.
        assert img[0, 0, 2] == pytest.approx(1.0, abs=1e-3)

    def test_front_to_back_occlusion(self):
        """A nearly opaque front splat hides one behind it."""
        inv = 1.0 / 9.0
        out = rasterize_gaussians(
            means2d=jnp.array([[16.5, 16.5], [16.5, 16.5]]),
            depths=jnp.array([1.0, 2.0]),
            conics=jnp.array([[inv, 0.0, inv]] * 2),
            radii=jnp.array([9.0, 9.0]),
            colors=jnp.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]]),
            opacities=jnp.array([0.99, 0.99]),
            visible=jnp.array([True, True]),
            width=32, height=32, background=jnp.zeros(3),
            max_per_tile=8, tile_chunk=2)
        img = np.asarray(out['rgb'])
        assert img[16, 16, 1] > 0.9   # front green dominates
        assert img[16, 16, 0] < 0.05

    def test_depth_output(self):
        out = self._raster_one()
        depth = np.asarray(out['depth'])
        assert depth[16, 16, 0] == pytest.approx(2.0, abs=1e-3)

    def test_gradients_flow_to_all_inputs(self):
        def loss(means2d, conics, colors, opacities):
            out = rasterize_gaussians(
                means2d=means2d, depths=jnp.array([2.0]), conics=conics,
                radii=jnp.array([9.0]), colors=colors, opacities=opacities,
                visible=jnp.array([True]), width=32, height=32,
                background=jnp.zeros(3), max_per_tile=8, tile_chunk=2)
            return jnp.sum(out['rgb'] ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
            jnp.array([[16.5, 16.5]]), jnp.array([[1 / 9.0, 0.0, 1 / 9.0]]),
            jnp.array([[1.0, 0.5, 0.2]]), jnp.array([0.9]))
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()
            assert float(jnp.abs(g).sum()) > 0

    def test_max_per_tile_overflow_keeps_front(self):
        """With K=4 and 8 overlapping splats, the 4 nearest are kept."""
        n = 8
        inv = 1.0 / 9.0
        depths = jnp.arange(1.0, n + 1)
        out = rasterize_gaussians(
            means2d=jnp.tile(jnp.array([[8.5, 8.5]]), (n, 1)),
            depths=depths,
            conics=jnp.tile(jnp.array([[inv, 0.0, inv]]), (n, 1)),
            radii=jnp.full(n, 6.0),
            colors=jnp.stack([jnp.linspace(0, 1, n)] * 3, -1),
            opacities=jnp.full(n, 0.3),
            visible=jnp.full(n, True),
            width=16, height=16, background=jnp.zeros(3),
            max_per_tile=4, tile_chunk=1)
        assert np.isfinite(np.asarray(out['rgb'])).all()
        assert float(out['alpha'][8, 8, 0]) > 0.5
