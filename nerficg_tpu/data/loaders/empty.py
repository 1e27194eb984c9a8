"""Camera-only 'Empty' dataset: a single default camera and no images.

Reference equivalent: src/Datasets/Empty.py:14-35 — used by the GUI when
viewing a checkpoint without any dataset on disk.
"""

from __future__ import annotations

import numpy as np

from nerficg_tpu.cameras.perspective import PerspectiveCamera
from nerficg_tpu.core.config import Configurable
from nerficg_tpu.core.registry import register_dataset
from nerficg_tpu.data.base import BaseDataset
from nerficg_tpu.data.types import View

__all__ = ['EmptyDataset']


@register_dataset('Empty')
@Configurable.configure(
    WIDTH=800,
    HEIGHT=800,
    NEAR_PLANE=0.1,
    FAR_PLANE=10.0,
)
class EmptyDataset(BaseDataset):

    def load(self) -> None:
        camera = PerspectiveCamera(width=int(self.WIDTH), height=int(self.HEIGHT),
                                   settings=self.camera_settings)
        c2w = np.eye(4)
        c2w[2, 3] = -3.0  # back the camera off the origin
        self.subsets['train'].append(View(camera=camera, c2w=c2w))
