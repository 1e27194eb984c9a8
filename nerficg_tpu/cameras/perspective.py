"""Pinhole perspective camera with optional radial/tangential distortion.

Reference equivalent: ``PerspectiveCamera`` (src/Cameras/Perspective.py:16-147):
focal/center defaulted from a 45 degree FOV, project/unproject with optional
distortion, vectorized local ray-direction grid, and the OpenGL projection
matrix + viewport transform consumed by the Gaussian-splatting rasterizer.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from nerficg_tpu.cameras.base import (BaseCamera, SharedCameraSettings,
                                      array_module)
from nerficg_tpu.cameras.distortion import RadialTangentialDistortion
from nerficg_tpu.cameras.pose import fov_to_focal

__all__ = ['PerspectiveCamera']


class PerspectiveCamera(BaseCamera):

    def __init__(self, width: int, height: int,
                 focal_x: float | None = None, focal_y: float | None = None,
                 center_x: float | None = None, center_y: float | None = None,
                 distortion: RadialTangentialDistortion | None = None,
                 settings: SharedCameraSettings | None = None):
        super().__init__(width, height, settings)
        # Default 45 degree vertical FOV (reference: Perspective.py:24-37).
        default_focal = fov_to_focal(math.radians(45.0), height)
        self.focal_x = float(focal_x if focal_x is not None else default_focal)
        self.focal_y = float(focal_y if focal_y is not None else self.focal_x)
        self.center_x = float(center_x if center_x is not None else width / 2.0)
        self.center_y = float(center_y if center_y is not None else height / 2.0)
        self.distortion = distortion

    def _intrinsics_key(self) -> tuple:
        d = self.distortion
        dist_key = () if d is None else (d.k1, d.k2, d.k3, d.k4, d.k5, d.k6, d.p1, d.p2)
        return (self.focal_x, self.focal_y, self.center_x, self.center_y) + dist_key

    @property
    def fov_x(self) -> float:
        return 2.0 * math.atan2(0.5 * self.width, self.focal_x)

    @property
    def fov_y(self) -> float:
        return 2.0 * math.atan2(0.5 * self.height, self.focal_y)

    def scaled(self, factor: float) -> 'PerspectiveCamera':
        """New camera at a different image scale (for IMAGE_SCALE_FACTOR)."""
        return PerspectiveCamera(
            width=max(int(round(self.width * factor)), 1),
            height=max(int(round(self.height * factor)), 1),
            focal_x=self.focal_x * factor, focal_y=self.focal_y * factor,
            center_x=self.center_x * factor, center_y=self.center_y * factor,
            distortion=self.distortion, settings=self.settings)

    # -- projection ----------------------------------------------------------
    def cam_to_screen(self, points_cam: jnp.ndarray) -> jnp.ndarray:
        """(..., 3) camera space -> (..., 3) = (px, py, depth)
        (reference: Perspective.py:39-50). Backend-generic: numpy in ->
        numpy out (host path), jnp/tracer in -> jnp (jitted path)."""
        xp = array_module(points_cam)
        z = points_cam[..., 2:3]
        xy = points_cam[..., :2] / xp.where(xp.abs(z) < 1e-12, 1e-12, z)
        if self.distortion is not None and not self.distortion.is_identity():
            xy = self.distortion.distort(xy)
        px = xy[..., 0:1] * self.focal_x + self.center_x
        py = xy[..., 1:2] * self.focal_y + self.center_y
        return xp.concatenate([px, py, z], axis=-1)

    def screen_to_cam(self, pixels: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
        """(..., 2) pixels + (...,) depth -> (..., 3) camera space
        (reference: Perspective.py:52-62)."""
        xp = array_module(pixels, depth)
        x = (pixels[..., 0] - self.center_x) / self.focal_x
        y = (pixels[..., 1] - self.center_y) / self.focal_y
        xy = xp.stack([x, y], axis=-1)
        if self.distortion is not None and not self.distortion.is_identity():
            xy = self.distortion.undistort(xy)
        depth = xp.asarray(depth)
        return xp.concatenate([xy * depth[..., None], depth[..., None]], axis=-1)

    def _compute_local_ray_directions(self) -> jnp.ndarray:
        """(H*W, 3) camera-space directions (reference: Perspective.py:64-94)."""
        pixels = self.pixel_grid()
        dirs = self.screen_to_cam(pixels, jnp.ones(pixels.shape[0], jnp.float32))
        return dirs

    # -- rasterizer support ---------------------------------------------------
    def projection_matrix(self, z_near: float | None = None,
                          z_far: float | None = None) -> np.ndarray:
        """OpenGL-style perspective projection matrix used by the Gaussian
        rasterizer (reference: Perspective.py:96-147). Maps camera space to
        clip space; principal-point offset included."""
        z_near = self.near if z_near is None else z_near
        z_far = self.far if z_far is None else z_far
        w, h = self.width, self.height
        proj = np.zeros((4, 4), dtype=np.float32)
        proj[0, 0] = 2.0 * self.focal_x / w
        proj[1, 1] = 2.0 * self.focal_y / h
        proj[0, 2] = 2.0 * self.center_x / w - 1.0
        proj[1, 2] = 2.0 * self.center_y / h - 1.0
        proj[2, 2] = z_far / (z_far - z_near)
        proj[2, 3] = -(z_far * z_near) / (z_far - z_near)
        proj[3, 2] = 1.0
        return proj
