"""3D Gaussian Splatting method plugin
(reference: src/Methods/GaussianSplatting/__init__.py)."""

from nerficg_tpu.core.registry import register_method
from nerficg_tpu.methods.gaussian_splatting.model import GaussianSplattingModel
from nerficg_tpu.methods.gaussian_splatting.renderer import GaussianSplattingRenderer
from nerficg_tpu.methods.gaussian_splatting.trainer import GaussianSplattingTrainer

MODEL = GaussianSplattingModel
RENDERER = GaussianSplattingRenderer
TRAINING_INSTANCE = GaussianSplattingTrainer

register_method('GaussianSplatting', GaussianSplattingModel,
                GaussianSplattingRenderer, GaussianSplattingTrainer)
