"""D-NeRF dynamic-scene dataset loader (Blender format + timestamps).

Reference equivalent: src/Datasets/DNeRF.py:22-89 — NeRF-synthetic transforms
json with per-frame ``time`` fields; timestamps normalized to [0, 1].
"""

from __future__ import annotations

import json

import numpy as np

from nerficg_tpu.cameras.perspective import PerspectiveCamera
from nerficg_tpu.cameras.pose import fov_to_focal
from nerficg_tpu.core.config import Configurable
from nerficg_tpu.core.errors import DatasetError
from nerficg_tpu.core.registry import register_dataset
from nerficg_tpu.data.loaders.nerf import NeRFDataset, opengl_to_colmap
from nerficg_tpu.data.types import ImageData, View

__all__ = ['DNeRFDataset']


@register_dataset('DNeRF')
@Configurable.configure(
    NEAR_PLANE=2.0,
    FAR_PLANE=6.0,
    BACKGROUND_COLOR=[1.0, 1.0, 1.0],
)
class DNeRFDataset(NeRFDataset):

    def load(self) -> None:
        if not self.path.is_dir():
            raise DatasetError(f'D-NeRF dataset path not found: {self.path}')
        cameras: dict[tuple, PerspectiveCamera] = {}
        all_times: list[float] = []
        staged = []
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
                        width=width, height=height, focal_x=focal,
                        focal_y=focal, settings=self.camera_settings)
                timestamp = float(frame.get('time', 0.0))
                all_times.append(timestamp)
                view = View(
                    camera=cameras[key],
                    c2w=opengl_to_colmap(np.asarray(frame['transform_matrix'])),
                    frame_idx=frame_idx, timestamp=timestamp,
                    rgb=ImageData(path=img_path, channels=slice(0, 3),
                                  scale_factor=scale),
                    alpha=ImageData(path=img_path, channels=slice(3, 4),
                                    scale_factor=scale))
                staged.append((subset, view))
        if not staged:
            raise DatasetError(f'no views found in {self.path}')
        # Normalize timestamps to [0, 1] (reference: DNeRF.py:70-80).
        t_max = max(all_times) or 1.0
        for subset, view in staged:
            view.timestamp = view.timestamp / t_max
            self.subsets[subset].append(view)
