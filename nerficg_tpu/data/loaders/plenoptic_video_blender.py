"""Plenoptic-video (D-NeRF-format dynamic video) dataset loader.

Reference equivalent: src/Datasets/PlenopticVideoBlender.py:18 — D-NeRF json
format with a MAX_TIMESTAMP cap for sequences where time does not span [0,1].
"""

from __future__ import annotations

from nerficg_tpu.core.config import Configurable
from nerficg_tpu.core.registry import register_dataset
from nerficg_tpu.data.loaders.dnerf import DNeRFDataset

__all__ = ['PlenopticVideoBlenderDataset']


@register_dataset('PlenopticVideoBlender')
@Configurable.configure(
    MAX_TIMESTAMP=1.0,
    NEAR_PLANE=0.1,
    FAR_PLANE=20.0,
    BACKGROUND_COLOR=[0.0, 0.0, 0.0],
)
class PlenopticVideoBlenderDataset(DNeRFDataset):

    def load(self) -> None:
        super().load()
        cap = float(self.MAX_TIMESTAMP)
        if cap > 0:
            for view in self.all_views():
                view.timestamp = min(view.timestamp, cap)
