"""Camera and pose-math tests against numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from nerficg_tpu.cameras import (EquirectangularCamera, PerspectiveCamera,
                                 RadialTangentialDistortion,
                                 SharedCameraSettings, generate_rays,
                                 invert_3d_affine, look_at,
                                 quaternion_to_rotation_matrix,
                                 recenter_poses, rotation_matrix_to_quaternion,
                                 transform_poses_pca)


class TestPoseMath:
    def test_quaternion_roundtrip(self, np_rng):
        for _ in range(10):
            q = np_rng.normal(size=4)
            q /= np.linalg.norm(q)
            if q[0] < 0:
                q = -q
            m = quaternion_to_rotation_matrix(q)
            assert np.allclose(m @ m.T, np.eye(3), atol=1e-10)
            q2 = rotation_matrix_to_quaternion(m)
            assert np.allclose(q, q2, atol=1e-8) or np.allclose(q, -q2, atol=1e-8)

    def test_invert_affine(self, np_rng):
        q = np_rng.normal(size=4)
        m = np.eye(4)
        m[:3, :3] = quaternion_to_rotation_matrix(q / np.linalg.norm(q))
        m[:3, 3] = np_rng.normal(size=3)
        inv = invert_3d_affine(m)
        assert np.allclose(inv @ m, np.eye(4), atol=1e-10)

    def test_look_at(self):
        c2w = look_at(np.array([0, 0, -5.0]), np.zeros(3))
        # forward (z column) points toward the target
        assert np.allclose(c2w[:3, 2], [0, 0, 1], atol=1e-12)
        assert np.allclose(c2w[:3, 3], [0, 0, -5])
        # orthonormal
        rot = c2w[:3, :3]
        assert np.allclose(rot @ rot.T, np.eye(3), atol=1e-12)

    def test_recenter(self, np_rng):
        c2ws = np.stack([look_at(np_rng.normal(size=3) + [0, 0, -5], np.zeros(3))
                         for _ in range(6)])
        centered, transform = recenter_poses(c2ws)
        avg_pos = centered[:, :3, 3].mean(0)
        assert np.allclose(avg_pos, 0, atol=1e-8)

    def test_pca_alignment(self, np_rng):
        # Cameras spread mostly along one direction -> that direction becomes
        # the first principal axis; translations bounded by 1.
        t = np_rng.normal(size=(20, 3)) * np.array([5.0, 1.0, 0.2])
        c2ws = np.tile(np.eye(4), (20, 1, 1))
        c2ws[:, :3, 3] = t
        aligned, transform = transform_poses_pca(c2ws)
        assert np.abs(aligned[:, :3, 3]).max() <= 1.0 + 1e-9
        spread = aligned[:, :3, 3].std(0)
        assert spread[0] >= spread[1] >= spread[2]


class TestPerspectiveCamera:
    def test_project_unproject_roundtrip(self, np_rng):
        cam = PerspectiveCamera(width=64, height=48, focal_x=60.0, focal_y=55.0,
                                center_x=33.0, center_y=25.0)
        pts = np_rng.random((100, 3)).astype(np.float32)
        pts[:, 2] += 1.0
        screen = cam.cam_to_screen(jnp.asarray(pts))
        back = cam.screen_to_cam(screen[..., :2], screen[..., 2])
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)

    def test_distorted_roundtrip(self, np_rng):
        dist = RadialTangentialDistortion(k1=0.1, k2=-0.05, p1=0.01, p2=-0.01)
        cam = PerspectiveCamera(width=64, height=64, focal_x=80.0,
                                distortion=dist)
        pts = (np_rng.random((50, 3)).astype(np.float32) - 0.5)
        pts[:, 2] = 2.0
        screen = cam.cam_to_screen(jnp.asarray(pts))
        back = cam.screen_to_cam(screen[..., :2], screen[..., 2])
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-3)

    def test_center_ray(self):
        cam = PerspectiveCamera(width=10, height=10)
        dirs = np.asarray(cam.local_ray_directions()).reshape(10, 10, 3)
        # central rays point near +z
        center = dirs[4:6, 4:6].reshape(-1, 3)
        center /= np.linalg.norm(center, axis=-1, keepdims=True)
        assert (center[:, 2] > 0.99).all()

    def test_ray_direction_cache(self):
        cam = PerspectiveCamera(width=8, height=8)
        a = cam.local_ray_directions()
        b = cam.local_ray_directions()
        assert a is b

    def test_scaled(self):
        cam = PerspectiveCamera(width=100, height=50, focal_x=80.0)
        half = cam.scaled(0.5)
        assert half.width == 50 and half.height == 25
        assert half.focal_x == pytest.approx(40.0)

    def test_projection_matrix_maps_frustum(self):
        cam = PerspectiveCamera(width=64, height=64, focal_x=32.0,
                                center_x=32.0, center_y=32.0,
                                settings=SharedCameraSettings(near=0.1, far=10.0))
        proj = cam.projection_matrix()
        # A point on the +x edge of the frustum at depth z maps to clip x/w = 1.
        z = 5.0
        edge_x = z * (cam.width / 2) / cam.focal_x
        p = proj @ np.array([edge_x, 0, z, 1.0])
        assert p[0] / p[3] == pytest.approx(1.0, abs=1e-5)


class TestEquirectangularCamera:
    def test_roundtrip(self, np_rng):
        cam = EquirectangularCamera(width=128, height=64)
        pix = np_rng.random((100, 2)).astype(np.float32) * \
            np.array([128, 64], np.float32)
        depth = np_rng.random(100).astype(np.float32) + 0.5
        pts = cam.screen_to_cam(jnp.asarray(pix), jnp.asarray(depth))
        screen = np.asarray(cam.cam_to_screen(pts))
        np.testing.assert_allclose(screen[:, :2], pix, atol=1e-2)
        np.testing.assert_allclose(screen[:, 2], depth, atol=1e-4)

    def test_covers_sphere(self):
        cam = EquirectangularCamera(width=64, height=32)
        dirs = np.asarray(cam.local_ray_directions())
        norms = np.linalg.norm(dirs, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        # All octants hit
        for sx in (-1, 1):
            for sy in (-1, 1):
                for sz in (-1, 1):
                    assert ((np.sign(dirs[:, 0]) == sx) &
                            (np.sign(dirs[:, 1]) == sy) &
                            (np.sign(dirs[:, 2]) == sz)).any()


class TestGenerateRays:
    def test_identity_pose(self):
        cam = PerspectiveCamera(width=4, height=4)
        origins, dirs = generate_rays(jnp.eye(4), cam.local_ray_directions())
        assert np.allclose(np.asarray(origins), 0)
        assert np.allclose(np.linalg.norm(np.asarray(dirs), axis=-1), 1, atol=1e-6)

    def test_translation(self):
        cam = PerspectiveCamera(width=4, height=4)
        c2w = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 2.0, 3.0]))
        origins, _ = generate_rays(c2w, cam.local_ray_directions())
        assert np.allclose(np.asarray(origins), np.array([1., 2., 3.]))
