"""NeRF-synthetic (Blender) dataset loader.

Reference equivalent: src/Datasets/NeRF.py:42-107 — transforms_{split}.json
with camera_angle_x and per-frame OpenGL camera-to-world matrices; RGBA images
split into rgb + alpha channels; OpenGL -> COLMAP axis conversion.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from nerficg_tpu.cameras.perspective import PerspectiveCamera
from nerficg_tpu.cameras.pose import fov_to_focal
from nerficg_tpu.core.config import Configurable
from nerficg_tpu.core.errors import DatasetError
from nerficg_tpu.core.registry import register_dataset
from nerficg_tpu.data.base import BaseDataset
from nerficg_tpu.data.types import ImageData, View

__all__ = ['NeRFDataset', 'opengl_to_colmap']

OPENGL_TO_COLMAP = np.diag(np.array([1.0, -1.0, -1.0, 1.0]))

# Blender -> COLMAP world rotation (reference: Datasets/NeRF.py:50-56).
# Training is rotation-invariant, but exported poses / point clouds /
# trajectories must live in the same world frame as the reference's.
BLENDER_TO_COLMAP_WORLD = np.array([
    [1.0, 0.0, 0.0, 0.0],
    [0.0, 0.0, -1.0, 0.0],
    [0.0, 1.0, 0.0, 0.0],
    [0.0, 0.0, 0.0, 1.0],
])


def opengl_to_colmap(c2w: np.ndarray) -> np.ndarray:
    """Blender/OpenGL camera-to-world -> COLMAP: flip camera y/z axes AND
    apply the Blender->COLMAP world rotation
    (reference: Datasets/NeRF.py:50-56,66: world @ c2w @ cam_transform)."""
    out = np.asarray(c2w, dtype=np.float64)
    return BLENDER_TO_COLMAP_WORLD @ out @ OPENGL_TO_COLMAP


@register_dataset('NeRF')
@Configurable.configure(
    NEAR_PLANE=2.0,
    FAR_PLANE=6.0,
    BACKGROUND_COLOR=[1.0, 1.0, 1.0],
    LOAD_TEST_DEPTH=False,
)
class NeRFDataset(BaseDataset):

    SPLIT_FILES = {'train': 'transforms_train.json',
                   'test': 'transforms_test.json',
                   'val': 'transforms_val.json'}

    def load(self) -> None:
        if not self.path.is_dir():
            raise DatasetError(f'NeRF dataset path not found: {self.path}')
        cameras: dict[tuple, PerspectiveCamera] = {}
        for subset, filename in self.SPLIT_FILES.items():
            meta_path = self.path / filename
            if not meta_path.is_file():
                continue
            with open(meta_path) as f:
                meta = json.load(f)
            for frame_idx, frame in enumerate(meta['frames']):
                rel = frame['file_path'].lstrip('./')
                img_path = self.path / rel
                if not img_path.suffix:
                    img_path = img_path.with_suffix('.png')
                if not img_path.is_file():
                    continue
                # Peek size once per unique resolution via PIL header read.
                from PIL import Image as _Image
                with _Image.open(img_path) as img:
                    width, height = img.size
                scale = self.IMAGE_SCALE_FACTOR
                if scale:
                    width = max(int(round(width * scale)), 1)
                    height = max(int(round(height * scale)), 1)
                focal = fov_to_focal(float(meta['camera_angle_x']), width)
                key = (width, height, focal)
                if key not in cameras:
                    cameras[key] = PerspectiveCamera(
                        width=width, height=height, focal_x=focal, focal_y=focal,
                        settings=self.camera_settings)
                c2w = opengl_to_colmap(np.asarray(frame['transform_matrix']))
                rgba = ImageData(path=img_path, scale_factor=scale)
                view = View(
                    camera=cameras[key], c2w=c2w,
                    camera_index=0, frame_idx=frame_idx,
                    rgb=ImageData(path=img_path, channels=slice(0, 3),
                                  scale_factor=scale),
                    alpha=ImageData(path=img_path, channels=slice(3, 4),
                                    scale_factor=scale))
                if self.LOAD_TEST_DEPTH and subset == 'test':
                    depth_path = img_path.with_name(
                        img_path.stem + '_depth_0001.png')
                    if depth_path.is_file():
                        view.depth_data = ImageData(
                            path=depth_path, channels=slice(0, 1),
                            scale_factor=scale,
                            load_fn=self._load_blender_depth)
                self.subsets[subset].append(view)
        if not any(self.subsets.values()):
            raise DatasetError(f'no views found in {self.path}')

    @staticmethod
    def _load_blender_depth(path, scale_factor=None):
        """Blender test-set depth decode (reference: Datasets/NeRF.py:90-107):
        depth encoded as 8 - 8 * value in the red channel."""
        from nerficg_tpu.data.io import load_image
        img = load_image(path, scale_factor)
        return (8.0 - img[..., :1] * 8.0)
