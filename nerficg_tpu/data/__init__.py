from nerficg_tpu.data.base import BaseDataset
from nerficg_tpu.data.types import (AxisAlignedBox, BasicPointCloud, ImageData,
                                    RayBatch, RayCollection, View)
