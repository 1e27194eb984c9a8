"""Nvidia dynamic-scenes ("Nvidia short", NSFF-style monocularized) loader.

Reference equivalent: src/Datasets/NvidiaShort.py:16 — 12-camera rig
monocularized by taking camera (t mod 12) at time t; poses from a
``poses_bounds.npy`` (LLFF convention) file; per-frame timestamps.
"""

from __future__ import annotations

import numpy as np

from nerficg_tpu.cameras.perspective import PerspectiveCamera
from nerficg_tpu.core.config import Configurable
from nerficg_tpu.core.errors import DatasetError
from nerficg_tpu.core.registry import register_dataset
from nerficg_tpu.data.base import BaseDataset
from nerficg_tpu.data.types import ImageData, View

__all__ = ['NvidiaShortDataset']


def llff_pose_to_colmap(pose_3x5: np.ndarray) -> tuple[np.ndarray, float, int, int]:
    """LLFF [down right back | hwf] row layout -> COLMAP c2w + (focal, h, w)."""
    m = pose_3x5[:, :4]
    h, w, focal = pose_3x5[:, 4]
    # LLFF axes: x down, y right, z backward -> COLMAP x right, y down, z fwd.
    c2w = np.eye(4)
    c2w[:3, 0] = m[:, 1]          # right
    c2w[:3, 1] = m[:, 0]          # down
    c2w[:3, 2] = -m[:, 2]         # forward
    c2w[:3, 3] = m[:, 3]
    return c2w, float(focal), int(h), int(w)


@register_dataset('NvidiaShort')
@Configurable.configure(
    IMAGE_DIR='images',
    NEAR_PLANE=0.1,
    FAR_PLANE=100.0,
    TEST_HOLD_CAMERA=0,     # frames from this rig camera -> test split
)
class NvidiaShortDataset(BaseDataset):

    def load(self) -> None:
        poses_path = self.path / 'poses_bounds.npy'
        if not poses_path.is_file():
            raise DatasetError(f'poses_bounds.npy not found in {self.path}')
        poses_bounds = np.load(poses_path)          # (N, 17)
        poses = poses_bounds[:, :15].reshape(-1, 3, 5)
        bounds = poses_bounds[:, 15:]
        image_dir = self.path / str(self.IMAGE_DIR)
        images = sorted(p for p in image_dir.iterdir()
                        if p.suffix.lower() in ('.png', '.jpg', '.jpeg'))
        if len(images) != len(poses):
            raise DatasetError(
                f'{len(images)} images vs {len(poses)} poses in {self.path}')
        self.camera_settings.near = float(bounds[:, 0].min()) * 0.9
        self.camera_settings.far = float(bounds[:, 1].max()) * 1.1

        scale = self.IMAGE_SCALE_FACTOR
        n = len(images)
        cameras: dict[tuple, PerspectiveCamera] = {}
        for idx, (img_path, pose) in enumerate(zip(images, poses)):
            c2w, focal, h, w = llff_pose_to_colmap(pose)
            s = scale or 1.0
            key = (round(focal * s, 3), int(w * s), int(h * s))
            if key not in cameras:
                cameras[key] = PerspectiveCamera(
                    width=max(int(round(w * s)), 1),
                    height=max(int(round(h * s)), 1),
                    focal_x=focal * s, focal_y=focal * s,
                    settings=self.camera_settings)
            view = View(camera=cameras[key], c2w=c2w, frame_idx=idx,
                        timestamp=idx / max(n - 1, 1),
                        rgb=ImageData(path=img_path, channels=slice(0, 3),
                                      scale_factor=scale))
            self.subsets['train'].append(view)
