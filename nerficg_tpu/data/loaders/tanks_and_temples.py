"""Tanks & Temples dataset loader (COLMAP-format scenes).

Reference equivalent: src/Datasets/TanksAndTemples.py:16 — a COLMAP
specialization with unit-cube normalization and every-8th test split.
"""

from __future__ import annotations

from nerficg_tpu.core.config import Configurable
from nerficg_tpu.core.registry import register_dataset
from nerficg_tpu.data.loaders.colmap import ColmapDataset

__all__ = ['TanksAndTemplesDataset']


@register_dataset('TanksAndTemples')
@Configurable.configure(
    TEST_STEP=8,
    NORMALIZE_PCA=True,
    NORMALIZE_CUBE=True,
)
class TanksAndTemplesDataset(ColmapDataset):
    pass
