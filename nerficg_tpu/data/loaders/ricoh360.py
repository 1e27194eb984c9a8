"""Ricoh360 panorama dataset loader (captured equirectangular video frames).

Reference equivalent: src/Datasets/Ricoh360.py:18 — same transforms-json
equirectangular layout as OmniBlender, captured with a Ricoh Theta; every-Nth
test split when no explicit test transforms exist.
"""

from __future__ import annotations

from nerficg_tpu.core.config import Configurable
from nerficg_tpu.core.registry import register_dataset
from nerficg_tpu.data.loaders.omni_blender import OmniBlenderDataset

__all__ = ['Ricoh360Dataset']


@register_dataset('Ricoh360')
@Configurable.configure(
    NEAR_PLANE=0.1,
    FAR_PLANE=50.0,
    TEST_STEP=8,
)
class Ricoh360Dataset(OmniBlenderDataset):

    def load(self) -> None:
        super().load()
        # Captured sequences often ship a single transforms_train.json: carve
        # out a test split by stride (reference behavior for captured data).
        if not self.subsets['test'] and int(self.TEST_STEP) > 0:
            train = self.subsets['train']
            step = int(self.TEST_STEP)
            self.subsets['test'] = train[::step]
            self.subsets['train'] = [v for i, v in enumerate(train)
                                     if i % step != 0]
