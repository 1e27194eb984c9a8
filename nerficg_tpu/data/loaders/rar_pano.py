"""RaR-Pano (rolling-shutter-aware panorama) dataset loader.

Reference equivalent: src/Datasets/RaRPano.py:34 — equirectangular captures
with per-frame timestamps and an optional COLMAP-style point cloud for
bounds estimation.
"""

from __future__ import annotations

from nerficg_tpu.core.config import Configurable
from nerficg_tpu.core.registry import register_dataset
from nerficg_tpu.data.loaders.ricoh360 import Ricoh360Dataset
from nerficg_tpu.data.types import BasicPointCloud

__all__ = ['RaRPanoDataset']


@register_dataset('RaRPano')
@Configurable.configure(
    NEAR_PLANE=0.1,
    FAR_PLANE=50.0,
    POINT_CLOUD_FILE='points3d.ply',
)
class RaRPanoDataset(Ricoh360Dataset):

    def load(self) -> None:
        super().load()
        pcd_path = self.path / str(self.POINT_CLOUD_FILE)
        if pcd_path.is_file():
            self.point_cloud = BasicPointCloud.from_ply(pcd_path)
        # Normalize frame timestamps over the capture.
        views = self.all_views()
        if views:
            t_max = max(v.frame_idx for v in views) or 1
            for v in views:
                v.timestamp = v.frame_idx / t_max
