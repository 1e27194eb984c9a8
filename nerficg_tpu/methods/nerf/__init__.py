"""Vanilla NeRF method plugin (reference: src/Methods/NeRF/__init__.py:1-7)."""

from nerficg_tpu.core.registry import register_method
from nerficg_tpu.methods.nerf.model import NeRFModel
from nerficg_tpu.methods.nerf.renderer import NeRFRenderer
from nerficg_tpu.methods.nerf.trainer import NeRFTrainer

MODEL = NeRFModel
RENDERER = NeRFRenderer
TRAINING_INSTANCE = NeRFTrainer

register_method('NeRF', NeRFModel, NeRFRenderer, NeRFTrainer)
