"""Dataset base class: subsets, normalization, bounding boxes, ray precompute.

Reference equivalent: ``BaseDataset`` (src/Datasets/Base.py:29-244).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerficg_tpu.cameras.base import SharedCameraSettings
from nerficg_tpu.core.config import ConfigNode, Configurable
from nerficg_tpu.core.errors import DatasetError
from nerficg_tpu.core.logging import Logger
from nerficg_tpu.data.types import (AxisAlignedBox, BasicPointCloud, RayBatch,
                                    RayCollection, View)

__all__ = ['BaseDataset']


@Configurable.configure(
    PATH='',
    IMAGE_SCALE_FACTOR=None,
    NORMALIZE_CUBE=False,
    NORMALIZE_RECENTER=False,
    BACKGROUND_COLOR=[0.0, 0.0, 0.0],
    NEAR_PLANE=0.01,
    FAR_PLANE=100.0,
)
class BaseDataset(Configurable):
    """Loads views into train/test/val subsets with a mode switch
    (reference: Datasets/Base.py:56-74); estimates scene bounds; optionally
    normalizes the scene into the unit cube."""

    SUBSETS = ('train', 'test', 'val')

    def __init__(self, config: ConfigNode | None, path: str | None = None):
        super().__init__(config, 'DATASET')
        if path is not None:
            self.PATH = path
        self.path = Path(self.PATH)
        self.camera_settings = SharedCameraSettings(
            background_color=np.asarray(self.BACKGROUND_COLOR, np.float32),
            near=float(self.NEAR_PLANE), far=float(self.FAR_PLANE))
        self.subsets: dict[str, list[View]] = {s: [] for s in self.SUBSETS}
        self.mode: str = 'train'
        self.point_cloud: Optional[BasicPointCloud] = None
        self.bounding_box: Optional[AxisAlignedBox] = None
        self.ray_collection: Optional[RayCollection] = None
        self._applied_transform = np.eye(4)

        start = time.perf_counter()
        self.load()
        Logger.info(f'{type(self).__name__}: loaded '
                    f'{ {s: len(v) for s, v in self.subsets.items()} } views in '
                    f'{time.perf_counter() - start:.2f}s')
        self._assign_global_indices()
        if self.NORMALIZE_RECENTER or self.NORMALIZE_CUBE:
            self.normalize_scene()
        if self.bounding_box is None:
            self.bounding_box = self.estimate_bounding_box()

    # -- plugin contract ---------------------------------------------------------
    def load(self) -> None:
        """Populate ``self.subsets`` (and optionally point_cloud / bounding_box).
        (reference: Datasets/Base.py:76-79)"""
        raise NotImplementedError

    # -- subset handling ----------------------------------------------------------
    def set_mode(self, mode: str) -> 'BaseDataset':
        if mode not in self.SUBSETS:
            raise DatasetError(f'unknown subset {mode!r}; expected {self.SUBSETS}')
        self.mode = mode
        return self

    @property
    def views(self) -> list[View]:
        return self.subsets[self.mode]

    def train(self) -> 'BaseDataset':
        return self.set_mode('train')

    def test(self) -> 'BaseDataset':
        return self.set_mode('test')

    def val(self) -> 'BaseDataset':
        return self.set_mode('val')

    def __len__(self) -> int:
        return len(self.views)

    def __getitem__(self, idx: int) -> View:
        return self.views[idx]

    def all_views(self) -> list[View]:
        return [v for s in self.SUBSETS for v in self.subsets[s]]

    def _assign_global_indices(self) -> None:
        for i, view in enumerate(self.all_views()):
            view.global_frame_idx = i

    # -- geometry -------------------------------------------------------------------
    def estimate_bounding_box(self) -> AxisAlignedBox:
        """From SfM points if available, else from camera frusta
        (reference: Datasets/Base.py:144-170)."""
        if self.point_cloud is not None and len(self.point_cloud) > 0:
            return self.point_cloud.filter_outliers().get_aabb()
        views = self.all_views()
        if not views:
            return AxisAlignedBox(np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]))
        points = []
        for view in views:
            points.append(view.position)
            # Frustum far-plane corners.
            cam = view.camera
            corners_px = np.array([[0, 0], [cam.width, 0], [0, cam.height],
                                   [cam.width, cam.height]], np.float32)
            far = np.full(4, cam.far, np.float32)
            points.append(view.unproject_points(corners_px, far))
        points = np.concatenate([np.atleast_2d(p) for p in points], axis=0)
        return AxisAlignedBox(np.stack([points.min(0), points.max(0)]))

    def normalize_scene(self) -> None:
        """Recenter and/or rescale all poses, planes, bbox, point cloud into the
        unit cube (reference: Datasets/Base.py:218-244)."""
        from nerficg_tpu.cameras.pose import recenter_poses, rescale_poses_to_unit_cube
        views = self.all_views()
        if not views:
            return
        c2ws = np.stack([v.c2w for v in views])
        transform = np.eye(4)
        if self.NORMALIZE_RECENTER:
            c2ws, t = recenter_poses(c2ws)
            transform = t @ transform
        scale = 1.0
        if self.NORMALIZE_CUBE:
            aabb = None if self.point_cloud is None else \
                self.point_cloud.filter_outliers().get_aabb().bounds
            c2ws, t = rescale_poses_to_unit_cube(c2ws, aabb=aabb)
            scale = float(t[0, 0])
            transform = t @ transform
        for view, c2w in zip(views, c2ws):
            view.c2w = c2w
            if view.depth_data.exists():
                view.depth_data.update_data_scale(scale)
        if scale != 1.0:
            self.camera_settings.near *= scale
            self.camera_settings.far *= scale
        if self.point_cloud is not None:
            self.point_cloud = self.point_cloud.transform(transform)
        if self.bounding_box is not None:
            self.bounding_box = self.bounding_box.transform(transform)
        self._applied_transform = transform

    # -- ray precompute -----------------------------------------------------------------
    def precompute_rays(self, subset: str = 'train') -> RayCollection:
        """Precompute all rays of a subset into one RayBatch pool
        (reference: Datasets/Base.py:172-216).

        When every view shares one camera (all in-repo loaders), rays for
        ALL views are generated in one jitted dispatch over stacked c2w
        matrices and images land in one host-side stack + one upload per
        field. The per-view ``get_rays`` loop costs several eager
        host<->device round trips per view — 20-30 s of pure dispatch
        latency per training run on the tunneled TPU (round-5 timings)."""
        views = self.subsets[subset]
        if not views:
            raise DatasetError(f'no views in subset {subset!r}')
        camera = views[0].camera
        if all(v.camera is camera for v in views):
            batch = self._precompute_rays_batched(views, camera)
            n = camera.width * camera.height
            slices = [(i * n, (i + 1) * n) for i in range(len(views))]
            self.ray_collection = RayCollection(batch, slices)
            return self.ray_collection
        batches, slices, offset = [], [], 0
        for view in views:
            rays = view.get_rays()
            batches.append(rays)
            slices.append((offset, offset + len(rays)))
            offset += len(rays)
        self.ray_collection = RayCollection(RayBatch.cat(batches), slices)
        return self.ray_collection

    @staticmethod
    def _precompute_rays_batched(views, camera) -> RayBatch:
        local_dirs = camera.local_ray_directions()          # (N, 3) device
        c2w = jnp.asarray(np.stack([v.c2w for v in views]), jnp.float32)

        @jax.jit
        def gen(dirs_local, c2w_stack):
            rot = c2w_stack[:, :3, :3]                       # (V, 3, 3)
            t = c2w_stack[:, :3, 3]                          # (V, 3)
            d = jnp.einsum('nj,vij->vni', dirs_local, rot)
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            o = jnp.broadcast_to(t[:, None, :], d.shape)
            return o.reshape(-1, 3), d.reshape(-1, 3)

        origins, directions = gen(local_dirs, c2w)
        v, n = len(views), camera.width * camera.height

        def stack_images(slot):
            if not all(getattr(view, f'{slot}_data').exists()
                       for view in views):
                return None
            host = np.stack([np.asarray(getattr(view, slot)).reshape(n, -1)
                             for view in views])
            return jnp.asarray(host.reshape(v * n, -1), jnp.float32)

        timestamps = jnp.asarray(
            np.repeat(np.asarray([view.timestamp for view in views],
                                 np.float32), n)[:, None])
        view_ids = jnp.asarray(
            np.repeat(np.asarray([view.global_frame_idx for view in views],
                                 np.int32), n)[:, None])
        pixel_ids = jnp.asarray(
            np.tile(np.arange(n, dtype=np.int32), v)[:, None])
        return RayBatch(origins=origins, directions=directions,
                        view_directions=directions,
                        rgb=stack_images('rgb'), alpha=stack_images('alpha'),
                        depth=stack_images('depth'), timestamps=timestamps,
                        pixel_ids=pixel_ids, view_ids=view_ids)

    def preload(self, to_ram: bool = True) -> None:
        """Prefetch all images (reference: Trainer.py:122-161 preload levels)."""
        for view in Logger.progress(self.all_views(), desc='preloading images'):
            view.prefetch()
