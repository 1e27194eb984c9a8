"""Abstract camera model.

Reference equivalent: ``BaseCamera`` + ``SharedCameraSettings``
(src/Cameras/Base.py:13-78, src/Cameras/utils.py:162-177). Cameras are
host-side metadata objects; all per-pixel math is exposed as pure jnp
functions so it can run inside jitted render/train steps. Local ray-direction
grids are cached per camera keyed on the intrinsics, mirroring the
reference's per-camera cache.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from nerficg_tpu.core.errors import CameraError

__all__ = ['SharedCameraSettings', 'BaseCamera', 'generate_rays',
           'array_module']


def array_module(*arrays):
    """``jnp`` if any input is a JAX array/tracer, else ``numpy``.

    The per-pixel camera math is elementwise and backend-agnostic; picking
    the module off the inputs keeps it traceable inside jitted render/train
    steps while letting host callers (dataset bounding-box estimation,
    COLMAP point projection — a handful of tiny arrays per view) run on
    the host with ZERO device dispatches. Eager tiny-op dispatch to a
    remote TPU costs ~seconds of tunnel latency per dataset init and
    fails outright when no device is attached."""
    import jax
    for a in arrays:
        if isinstance(a, jax.Array) or hasattr(a, 'aval'):
            return jnp
    return np


@dataclass
class SharedCameraSettings:
    """Mutable background color + near/far shared by all cameras of a dataset
    (reference: Cameras/utils.py:162-177)."""

    background_color: np.ndarray = field(
        default_factory=lambda: np.zeros(3, dtype=np.float32))
    near: float = 0.01
    far: float = 100.0

    def __post_init__(self):
        self.background_color = np.asarray(self.background_color, dtype=np.float32)
        if self.near <= 0 or self.far <= self.near:
            raise CameraError(f'invalid near/far planes: {self.near}/{self.far}')


class BaseCamera:
    """Abstract camera (reference: Cameras/Base.py:13-78)."""

    def __init__(self, width: int, height: int,
                 settings: SharedCameraSettings | None = None):
        if width <= 0 or height <= 0:
            raise CameraError(f'invalid image size {width}x{height}')
        self.width = int(width)
        self.height = int(height)
        self.settings = settings if settings is not None else SharedCameraSettings()
        self._ray_direction_cache: dict = {}

    @property
    def near(self) -> float:
        return self.settings.near

    @property
    def far(self) -> float:
        return self.settings.far

    @property
    def background_color(self) -> np.ndarray:
        return self.settings.background_color

    @property
    def num_pixels(self) -> int:
        return self.width * self.height

    # -- abstract interface -------------------------------------------------
    def _intrinsics_key(self) -> tuple:
        raise NotImplementedError

    def cam_to_screen(self, points_cam: jnp.ndarray) -> jnp.ndarray:
        """Project camera-space points (..., 3) -> pixel coords + depth (..., 3)."""
        raise NotImplementedError

    def screen_to_cam(self, pixels: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
        """Unproject pixel coords (..., 2) at given depth -> camera space (..., 3)."""
        raise NotImplementedError

    def _compute_local_ray_directions(self) -> jnp.ndarray:
        """(H*W, 3) unnormalized camera-space ray directions, row-major pixels."""
        raise NotImplementedError

    # -- shared logic --------------------------------------------------------
    def local_ray_directions(self) -> jnp.ndarray:
        """Cached (H*W, 3) camera-space ray directions (reference: Base.py:40-60)."""
        key = (self.width, self.height) + self._intrinsics_key()
        if key not in self._ray_direction_cache:
            self._ray_direction_cache[key] = self._compute_local_ray_directions()
        return self._ray_direction_cache[key]

    def pixel_grid(self) -> jnp.ndarray:
        """(H*W, 2) pixel-center coordinates (x, y), row-major."""
        x = jnp.arange(self.width, dtype=jnp.float32) + 0.5
        y = jnp.arange(self.height, dtype=jnp.float32) + 0.5
        xx, yy = jnp.meshgrid(x, y, indexing='xy')
        return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)


def generate_rays(c2w: jnp.ndarray, local_directions: jnp.ndarray,
                  normalize: bool = True) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate camera-space directions into the world and emit origins.

    Pure function usable inside jit; replaces the reference's host-side
    ``View.get_rays`` tensor assembly (Datasets/utils.py:1053-1074).

    Args:
      c2w: (4, 4) or (3, 4) camera-to-world matrix.
      local_directions: (N, 3) camera-space directions.

    Returns:
      (origins (N, 3), directions (N, 3)) world-space rays.
    """
    rot = c2w[:3, :3]
    t = c2w[:3, 3]
    directions = local_directions @ rot.T
    if normalize:
        directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(t, directions.shape)
    return origins, directions
