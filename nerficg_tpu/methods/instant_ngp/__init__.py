"""Instant-NGP method plugin (reference: src/Methods/InstantNGP/__init__.py)."""

from nerficg_tpu.core.registry import register_method
from nerficg_tpu.methods.instant_ngp.model import InstantNGPModel
from nerficg_tpu.methods.instant_ngp.renderer import InstantNGPRenderer
from nerficg_tpu.methods.instant_ngp.trainer import InstantNGPTrainer

MODEL = InstantNGPModel
RENDERER = InstantNGPRenderer
TRAINING_INSTANCE = InstantNGPTrainer

register_method('InstantNGP', InstantNGPModel, InstantNGPRenderer,
                InstantNGPTrainer)
