"""360-degree equirectangular (panorama) camera.

Reference equivalent: ``EquirectangularCamera`` (src/Cameras/Equirectangular.py:13-65):
direction <-> azimuth/elevation mapping, used by the OmniBlender / Ricoh360 /
RaRPano datasets.
"""

from __future__ import annotations

import jax.numpy as jnp

from nerficg_tpu.cameras.base import BaseCamera

__all__ = ['EquirectangularCamera']


class EquirectangularCamera(BaseCamera):
    """Pixel (x, y) maps to azimuth/elevation over the full sphere.

    Convention (matching COLMAP axes x right / y down / z forward):
      azimuth   theta in [-pi, pi]   from pixel x, 0 at image center (+z)
      elevation phi   in [-pi/2, pi/2] from pixel y, +pi/2 at top (-y)
    """

    def _intrinsics_key(self) -> tuple:
        return ()

    def scaled(self, factor: float) -> 'EquirectangularCamera':
        return EquirectangularCamera(
            width=max(int(round(self.width * factor)), 1),
            height=max(int(round(self.height * factor)), 1),
            settings=self.settings)

    def pixel_to_angles(self, pixels: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(..., 2) pixels -> (theta, phi) (reference: Cameras/utils.py:237-253)."""
        theta = (pixels[..., 0] / self.width - 0.5) * (2.0 * jnp.pi)
        phi = (0.5 - pixels[..., 1] / self.height) * jnp.pi
        return theta, phi

    def angles_to_pixel(self, theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
        x = (theta / (2.0 * jnp.pi) + 0.5) * self.width
        y = (0.5 - phi / jnp.pi) * self.height
        return jnp.stack([x, y], axis=-1)

    def cam_to_screen(self, points_cam: jnp.ndarray) -> jnp.ndarray:
        """(..., 3) -> (px, py, range) (reference: Equirectangular.py:16-40)."""
        x, y, z = points_cam[..., 0], points_cam[..., 1], points_cam[..., 2]
        r = jnp.sqrt(x * x + y * y + z * z)
        theta = jnp.arctan2(x, z)
        phi = jnp.arcsin(jnp.clip(-y / jnp.maximum(r, 1e-12), -1.0, 1.0))
        pix = self.angles_to_pixel(theta, phi)
        return jnp.concatenate([pix, r[..., None]], axis=-1)

    def screen_to_cam(self, pixels: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
        """(reference: Equirectangular.py:42-65)"""
        theta, phi = self.pixel_to_angles(pixels)
        cos_phi = jnp.cos(phi)
        direction = jnp.stack([
            cos_phi * jnp.sin(theta),   # x right
            -jnp.sin(phi),              # y down
            cos_phi * jnp.cos(theta),   # z forward
        ], axis=-1)
        return direction * jnp.asarray(depth)[..., None]

    def _compute_local_ray_directions(self) -> jnp.ndarray:
        pixels = self.pixel_grid()
        return self.screen_to_cam(pixels, jnp.ones(pixels.shape[0], jnp.float32))
