"""D-NeRF dynamic-scene method plugin (deformation + canonical Instant-NGP).

The reference hosts dynamic methods as plugins over the same contract
(SURVEY §2.3); this package is the in-tree dynamic method consuming the
timestamped data model (DNeRF/NvidiaShort/PlenopticVideoBlender loaders).
"""

from nerficg_tpu.core.registry import register_method
from nerficg_tpu.methods.dnerf.model import DNeRFModel
from nerficg_tpu.methods.dnerf.renderer import DNeRFRenderer
from nerficg_tpu.methods.dnerf.trainer import DNeRFTrainer

MODEL = DNeRFModel
RENDERER = DNeRFRenderer
TRAINING_INSTANCE = DNeRFTrainer

register_method('DNeRF', DNeRFModel, DNeRFRenderer, DNeRFTrainer)
