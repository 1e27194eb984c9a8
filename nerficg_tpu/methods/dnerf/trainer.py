"""D-NeRF trainer: the Instant-NGP schedule over timestamped ray pools.

The Instant-NGP trainer already threads per-ray timestamps from the pool
through the train step (methods/instant_ngp/trainer.py); the dynamic
method only needs a gentler learning rate for the deformation field.
"""

from __future__ import annotations

from nerficg_tpu.core.config import Configurable
from nerficg_tpu.methods.instant_ngp.trainer import InstantNGPTrainer

__all__ = ['DNeRFTrainer']


@Configurable.configure(
    NUM_ITERATIONS=30000,
)
class DNeRFTrainer(InstantNGPTrainer):
    pass
