"""Core data model: lazy images, views, ray batches, point clouds, AABBs.

Reference equivalent: the data-model half of src/Datasets/utils.py
(ImageData :693-763, View :766-1086, RayBatch :536-670, RayCollection
:673-690, BasicPointCloud :300-403, AxisAlignedBox :406-457).

TPU-first redesign notes:
  * ``RayBatch`` is a registered JAX pytree (SoA of arrays) so whole batches
    move through jit/shard_map without host round-trips.
  * Images live as numpy HWC on the host until a step consumes them; rays are
    generated on device from (c2w, intrinsics, pixel ids) instead of being
    precomputed per pixel on the host.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nerficg_tpu.cameras.base import BaseCamera, generate_rays
from nerficg_tpu.core.errors import DatasetError
from nerficg_tpu.data.io import load_image, resize_image

__all__ = ['ImageData', 'View', 'RayBatch', 'RayCollection',
           'BasicPointCloud', 'AxisAlignedBox']


# =============================================================================
# ImageData: lazy per-file image handle
# =============================================================================

@dataclass
class ImageData:
    """Lazy image handle (reference: Datasets/utils.py:693-763).

    Holds path + channel slice + scale factor + custom load/resize functions;
    data is decoded on first access and optionally cached in RAM.
    """

    path: Optional[Path] = None
    channels: Optional[slice] = None
    scale_factor: Optional[float] = None
    load_fn: Optional[Callable] = None
    resize_fn: Optional[Callable] = None
    data: Optional[np.ndarray] = None       # eager data (HWC float32)
    data_scale: float = 1.0                 # multiplicative rescale (depth units)
    _cache: Optional[np.ndarray] = field(default=None, repr=False)

    def exists(self) -> bool:
        return self.data is not None or (self.path is not None and Path(self.path).is_file())

    def load(self) -> Optional[np.ndarray]:
        """Decode (or return cached/eager) image -> HWC float32."""
        if self.data is not None:
            out = self.data
        else:
            if self._cache is not None:
                return self._cache
            if self.path is None:
                return None
            fn = self.load_fn if self.load_fn is not None else load_image
            out = fn(self.path, None)
            if self.scale_factor is not None and self.scale_factor != 1.0:
                rfn = self.resize_fn if self.resize_fn is not None else resize_image
                out = rfn(out, self.scale_factor)
        if self.channels is not None:
            out = out[..., self.channels]
        if self.data_scale != 1.0:
            out = out * self.data_scale
        return out

    def prefetch(self) -> 'ImageData':
        """Decode now and keep in RAM (reference: ImageData.prefetch)."""
        if self.data is None and self._cache is None and self.path is not None:
            self._cache = self.load()
        return self

    def release(self) -> None:
        self._cache = None

    def update_data_scale(self, scale: float) -> None:
        """Multiplicative rescale applied at load (depth normalization;
        reference: Datasets/utils.py:756-763)."""
        self.data_scale *= scale
        self._cache = None  # re-applied on next load


# =============================================================================
# RayBatch: SoA pytree of rays
# =============================================================================

_RAY_FIELDS = ('origins', 'directions', 'view_directions', 'rgb', 'alpha',
               'depth', 'timestamps', 'pixel_ids', 'view_ids')


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class RayBatch:
    """Structure-of-arrays ray batch (reference: Datasets/utils.py:536-670).

    All fields are (N, C) arrays or None. Registered as a JAX pytree so a
    RayBatch can be passed into jitted train/render steps and sharded over a
    device mesh directly.
    """

    origins: jnp.ndarray
    directions: jnp.ndarray
    view_directions: Optional[jnp.ndarray] = None
    rgb: Optional[jnp.ndarray] = None
    alpha: Optional[jnp.ndarray] = None
    depth: Optional[jnp.ndarray] = None
    timestamps: Optional[jnp.ndarray] = None
    pixel_ids: Optional[jnp.ndarray] = None
    view_ids: Optional[jnp.ndarray] = None

    def __post_init__(self):
        # Shape validation (reference: Datasets/utils.py:547-562). Skip under
        # tracing where shapes are abstract but still consistent.
        n = self.origins.shape[0]
        for name in _RAY_FIELDS:
            value = getattr(self, name)
            if value is not None and value.shape[0] != n:
                raise DatasetError(
                    f'RayBatch field {name} has {value.shape[0]} rays, expected {n}')

    # -- pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        children = tuple(getattr(self, name) for name in _RAY_FIELDS)
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        for name, value in zip(_RAY_FIELDS, children):
            object.__setattr__(obj, name, value)
        return obj

    # -- container ops ---------------------------------------------------------
    def __len__(self) -> int:
        return int(self.origins.shape[0])

    @property
    def num_rays(self) -> int:
        return len(self)

    def __getitem__(self, idx) -> 'RayBatch':
        return jax.tree_util.tree_map(lambda a: a[idx], self)

    def split(self, chunk_size: int) -> list['RayBatch']:
        n = len(self)
        return [self[i:i + chunk_size] for i in range(0, n, chunk_size)]

    @staticmethod
    def cat(batches: Sequence['RayBatch']) -> 'RayBatch':
        def _cat(*arrays):
            if any(a is None for a in arrays):
                return None
            return jnp.concatenate(arrays, axis=0)
        return jax.tree_util.tree_map(_cat, *batches, is_leaf=lambda x: x is None)

    def pad_to(self, size: int) -> 'RayBatch':
        """Pad to a static ray count (TPU static-shape requirement)."""
        n = len(self)
        if n == size:
            return self
        if n > size:
            return self[:size]
        pad = size - n

        def _pad(a):
            return None if a is None else jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        return jax.tree_util.tree_map(_pad, self, is_leaf=lambda x: x is None)

    def replace(self, **kwargs) -> 'RayBatch':
        return dataclasses.replace(self, **kwargs)


@dataclass
class RayCollection:
    """RayBatch + per-view slices (reference: Datasets/utils.py:673-690)."""

    rays: RayBatch
    view_slices: list[tuple[int, int]]

    def rays_of_view(self, view_index: int) -> RayBatch:
        start, stop = self.view_slices[view_index]
        return self.rays[start:stop]


# =============================================================================
# View: one observation
# =============================================================================

class View:
    """One observation: camera + pose + lazy image slots
    (reference: Datasets/utils.py:766-1086)."""

    IMAGE_SLOTS = ('rgb', 'alpha', 'depth', 'segmentation',
                   'flow_fwd', 'flow_bwd', 'misc')

    def __init__(self, camera: BaseCamera, c2w: np.ndarray,
                 camera_index: int = 0, frame_idx: int = 0,
                 global_frame_idx: int | None = None,
                 timestamp: float = 0.0, exif: dict | None = None,
                 rgb: ImageData | None = None, alpha: ImageData | None = None,
                 depth: ImageData | None = None,
                 segmentation: ImageData | None = None,
                 flow_fwd: ImageData | None = None,
                 flow_bwd: ImageData | None = None,
                 misc: ImageData | None = None):
        self.camera = camera
        self.c2w = c2w  # validated setter below
        self.camera_index = camera_index
        self.frame_idx = frame_idx
        self.global_frame_idx = frame_idx if global_frame_idx is None else global_frame_idx
        self.timestamp = float(timestamp)
        self.exif = exif or {}
        self.rgb_data = rgb if rgb is not None else ImageData()
        self.alpha_data = alpha if alpha is not None else ImageData()
        self.depth_data = depth if depth is not None else ImageData()
        self.segmentation_data = segmentation if segmentation is not None else ImageData()
        self.flow_fwd_data = flow_fwd if flow_fwd is not None else ImageData()
        self.flow_bwd_data = flow_bwd if flow_bwd is not None else ImageData()
        self.misc_data = misc if misc is not None else ImageData()

    # -- pose ------------------------------------------------------------------
    @property
    def c2w(self) -> np.ndarray:
        return self._c2w

    @c2w.setter
    def c2w(self, value: np.ndarray) -> None:
        value = np.asarray(value, dtype=np.float64)
        if value.shape == (3, 4):
            value = np.concatenate([value, np.array([[0., 0., 0., 1.]])], axis=0)
        if value.shape != (4, 4):
            raise DatasetError(f'c2w must be (4,4) or (3,4), got {value.shape}')
        self._c2w = value

    @property
    def w2c(self) -> np.ndarray:
        from nerficg_tpu.cameras.pose import invert_3d_affine
        return invert_3d_affine(self._c2w)

    @property
    def position(self) -> np.ndarray:
        return self._c2w[:3, 3]

    # -- image accessors (lazy) ---------------------------------------------------
    @property
    def rgb(self) -> Optional[np.ndarray]:
        return self.rgb_data.load()

    @property
    def alpha(self) -> Optional[np.ndarray]:
        return self.alpha_data.load()

    @property
    def depth(self) -> Optional[np.ndarray]:
        return self.depth_data.load()

    @property
    def segmentation(self) -> Optional[np.ndarray]:
        return self.segmentation_data.load()

    @property
    def flow_fwd(self) -> Optional[np.ndarray]:
        return self.flow_fwd_data.load()

    @property
    def flow_bwd(self) -> Optional[np.ndarray]:
        return self.flow_bwd_data.load()

    @property
    def misc(self) -> Optional[np.ndarray]:
        return self.misc_data.load()

    def prefetch(self) -> 'View':
        for slot in self.IMAGE_SLOTS:
            getattr(self, f'{slot}_data').prefetch()
        return self

    def release_images(self) -> None:
        for slot in self.IMAGE_SLOTS:
            getattr(self, f'{slot}_data').release()

    # -- geometry ------------------------------------------------------------------
    def world_to_cam(self, points: np.ndarray) -> np.ndarray:
        w2c = self.w2c
        return points @ w2c[:3, :3].T + w2c[:3, 3]

    def cam_to_world(self, points: np.ndarray) -> np.ndarray:
        return points @ self._c2w[:3, :3].T + self._c2w[:3, 3]

    def project_points(self, points_world: np.ndarray) -> np.ndarray:
        """World points -> (px, py, depth) (reference: utils.py:980-1005).

        Host-side: the camera math is backend-generic (cameras/base.py
        array_module), so numpy stays numpy — no device dispatch for the
        few-point geometry queries made during dataset init."""
        return np.asarray(self.camera.cam_to_screen(
            np.asarray(self.world_to_cam(points_world), np.float32)))

    def unproject_points(self, pixels: np.ndarray, depth: np.ndarray) -> np.ndarray:
        cam_pts = np.asarray(self.camera.screen_to_cam(
            np.asarray(pixels, np.float32), np.asarray(depth, np.float32)))
        return self.cam_to_world(cam_pts)

    def get_rays(self, with_images: bool = True) -> RayBatch:
        """Full-image RayBatch (reference: Datasets/utils.py:1053-1074)."""
        local_dirs = self.camera.local_ray_directions()
        origins, directions = generate_rays(
            jnp.asarray(self._c2w, jnp.float32), local_dirs)
        n = origins.shape[0]
        rgb = alpha = depth = None
        if with_images:
            if self.rgb_data.exists():
                rgb = jnp.asarray(self.rgb.reshape(n, -1), jnp.float32)
            if self.alpha_data.exists():
                alpha = jnp.asarray(self.alpha.reshape(n, -1), jnp.float32)
            if self.depth_data.exists():
                depth = jnp.asarray(self.depth.reshape(n, -1), jnp.float32)
        timestamps = jnp.full((n, 1), self.timestamp, jnp.float32)
        return RayBatch(origins=origins, directions=directions,
                        view_directions=directions, rgb=rgb, alpha=alpha,
                        depth=depth, timestamps=timestamps,
                        pixel_ids=jnp.arange(n, dtype=jnp.int32)[:, None],
                        view_ids=jnp.full((n, 1), self.global_frame_idx, jnp.int32))

    def to_simple(self) -> 'View':
        """Camera/pose-only copy without image handles (for GUI transfer;
        reference: utils.py:1076-1086)."""
        return View(camera=self.camera, c2w=self._c2w.copy(),
                    camera_index=self.camera_index, frame_idx=self.frame_idx,
                    global_frame_idx=self.global_frame_idx,
                    timestamp=self.timestamp)


# =============================================================================
# Point clouds and bounding boxes
# =============================================================================

@dataclass
class BasicPointCloud:
    """Positions + colors (reference: Datasets/utils.py:300-403)."""

    positions: np.ndarray                       # (N, 3) float
    colors: Optional[np.ndarray] = None         # (N, 3) float in [0, 1]
    normals: Optional[np.ndarray] = None

    def __post_init__(self):
        self.positions = np.asarray(self.positions, dtype=np.float32).reshape(-1, 3)
        if self.colors is not None:
            self.colors = np.asarray(self.colors, dtype=np.float32).reshape(-1, 3)

    def __len__(self) -> int:
        return self.positions.shape[0]

    def transform(self, mat4: np.ndarray) -> 'BasicPointCloud':
        pos = self.positions @ mat4[:3, :3].T + mat4[:3, 3]
        return BasicPointCloud(pos, self.colors, self.normals)

    def filter_outliers(self, quantile: float = 0.97) -> 'BasicPointCloud':
        """Drop points far from the median (reference: utils.py:352-367)."""
        center = np.median(self.positions, axis=0)
        dist = np.linalg.norm(self.positions - center, axis=-1)
        keep = dist <= np.quantile(dist, quantile)
        return BasicPointCloud(
            self.positions[keep],
            None if self.colors is None else self.colors[keep],
            None if self.normals is None else self.normals[keep])

    def get_aabb(self) -> 'AxisAlignedBox':
        return AxisAlignedBox(np.stack([self.positions.min(0), self.positions.max(0)]))

    @staticmethod
    def from_ply(path: str | Path) -> 'BasicPointCloud':
        from nerficg_tpu.data.ply import read_ply_pointcloud
        return read_ply_pointcloud(path)

    def save_ply(self, path: str | Path) -> None:
        from nerficg_tpu.data.ply import write_ply_pointcloud
        write_ply_pointcloud(self, path)


@dataclass
class AxisAlignedBox:
    """(2, 3) min/max box (reference: Datasets/utils.py:406-457)."""

    bounds: np.ndarray

    def __post_init__(self):
        self.bounds = np.asarray(self.bounds, dtype=np.float32).reshape(2, 3)
        if np.any(self.bounds[0] > self.bounds[1]):
            raise DatasetError(f'invalid AABB: min > max in {self.bounds}')

    @property
    def min(self) -> np.ndarray:
        return self.bounds[0]

    @property
    def max(self) -> np.ndarray:
        return self.bounds[1]

    @property
    def center(self) -> np.ndarray:
        return 0.5 * (self.bounds[0] + self.bounds[1])

    @property
    def size(self) -> np.ndarray:
        return self.bounds[1] - self.bounds[0]

    def transform(self, mat4: np.ndarray) -> 'AxisAlignedBox':
        corners = np.stack(np.meshgrid(*zip(self.bounds[0], self.bounds[1]),
                                       indexing='ij'), axis=-1).reshape(-1, 3)
        corners = corners @ mat4[:3, :3].T + mat4[:3, 3]
        return AxisAlignedBox(np.stack([corners.min(0), corners.max(0)]))

    def cube(self) -> 'AxisAlignedBox':
        """Smallest enclosing cube (reference: utils.py:440-448)."""
        half = self.size.max() * 0.5
        return AxisAlignedBox(np.stack([self.center - half, self.center + half]))
