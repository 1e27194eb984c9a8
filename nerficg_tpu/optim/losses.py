"""Declarative loss container + loss zoo.

Reference equivalents:
  * ``BaseLoss`` container (src/Optim/Losses/Base.py:11-63) — named weighted
    loss terms + unweighted quality metrics, per-call accumulation for logging.
  * Loss zoo: DSSIM (Losses/DSSIM.py), Charbonnier (Losses/Charbonnier.py:7),
    background entropy (Losses/BackgroundEntropy.py:6), depth smoothness
    (Losses/DepthSmoothness.py:31), MipNeRF360 distortion (Losses/Distortion.py:8
    -> ops.compositing.distortion_loss), magnitude (Losses/Magnitude.py:6),
    Barron robust loss (Losses/Robust.py:6).

All terms are pure jnp functions composable inside a jitted train step; the
container's accumulation happens on host from returned metric dicts.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax.numpy as jnp

__all__ = ['LossTerm', 'LossContainer', 'mse', 'l1', 'charbonnier', 'dssim',
           'background_entropy', 'depth_smoothness', 'magnitude',
           'robust_loss', 'vgg_perceptual']


# -- loss functions --------------------------------------------------------------

def mse(pred: jnp.ndarray, target: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    err = (pred - target) ** 2
    if mask is not None:
        return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask) * err.shape[-1], 1e-8)
    return jnp.mean(err)


def l1(pred: jnp.ndarray, target: jnp.ndarray,
       mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    err = jnp.abs(pred - target)
    if mask is not None:
        return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask) * err.shape[-1], 1e-8)
    return jnp.mean(err)


def charbonnier(pred: jnp.ndarray, target: jnp.ndarray,
                eps: float = 1e-3) -> jnp.ndarray:
    """(reference: Optim/Losses/Charbonnier.py:7)"""
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + eps * eps))


def dssim(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Differentiable structural dissimilarity (1 - SSIM) / 2 on HWC images.

    Reference equivalent: the fused-ssim CUDA wrapper (Optim/Losses/DSSIM.py:11-19);
    XLA fuses the separable convs on TPU so plain jnp suffices (SURVEY §2.12 N13).
    """
    from nerficg_tpu.optim.metrics import ssim
    return (1.0 - ssim(pred, target)) / 2.0


def background_entropy(alpha: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Encourage alpha to commit to 0/1 (reference: Losses/BackgroundEntropy.py:6)."""
    a = jnp.clip(alpha, eps, 1.0 - eps)
    return jnp.mean(-a * jnp.log(a) - (1.0 - a) * jnp.log(1.0 - a))


def depth_smoothness(depth: jnp.ndarray, rgb: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware depth smoothness on (H, W, 1)/(H, W, 3)
    (reference: Losses/DepthSmoothness.py:31)."""
    ddx = jnp.abs(depth[:, 1:] - depth[:, :-1])
    ddy = jnp.abs(depth[1:, :] - depth[:-1, :])
    wx = jnp.exp(-jnp.mean(jnp.abs(rgb[:, 1:] - rgb[:, :-1]), -1, keepdims=True))
    wy = jnp.exp(-jnp.mean(jnp.abs(rgb[1:, :] - rgb[:-1, :]), -1, keepdims=True))
    return jnp.mean(ddx * wx) + jnp.mean(ddy * wy)


def magnitude(values: jnp.ndarray, order: int = 1) -> jnp.ndarray:
    """L1/L2 magnitude regularizer (reference: Losses/Magnitude.py:6)."""
    return jnp.mean(jnp.abs(values) if order == 1 else values ** 2)


def robust_loss(x: jnp.ndarray, alpha: float = 1.0, scale: float = 1.0) -> jnp.ndarray:
    """Barron's general robust loss (reference: Losses/Robust.py:6)."""
    sq = (x / scale) ** 2
    if alpha == 2.0:
        return jnp.mean(0.5 * sq)
    if alpha == 0.0:
        return jnp.mean(jnp.log1p(0.5 * sq))
    if alpha == -jnp.inf:
        return jnp.mean(1.0 - jnp.exp(-0.5 * sq))
    beta = abs(alpha - 2.0)
    return jnp.mean((beta / alpha) * ((sq / beta + 1.0) ** (alpha / 2.0) - 1.0))


def vgg_perceptual(pred: jnp.ndarray, target: jnp.ndarray,
                   params: dict | None = None) -> jnp.ndarray:
    """VGG perceptual loss: mean L1 over feature-block activations
    (reference: src/Optim/Losses/VGG.py:22 — Johnson et al. feature loss).

    pred/target: (H, W, 3) or (N, H, W, 3) RGB in [0, 1].
    Reuses the on-device VGG16 trunk of optim/lpips_jax.py (the reference
    uses torchvision VGG19; same 5-block protocol, L1 over activations).
    ``params`` defaults to the LPIPS weight file — call
    ``optim.lpips_jax.load_weights`` / set NERFICG_LPIPS_WEIGHTS. Raises a
    clear error when no weights exist instead of silently returning noise
    (this environment cannot download pretrained weights; see
    lpips_jax.save_weights_npz for the one-time conversion)."""
    from nerficg_tpu.optim.lpips_jax import _vgg_features, load_weights
    if params is None:
        params = load_weights()
    if params is None:
        raise RuntimeError(
            'vgg_perceptual needs VGG16 weights: set NERFICG_LPIPS_WEIGHTS '
            'to a weights npz (optim/lpips_jax.py save_weights_npz)')
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    # The trunk normalizes internally from [-1, 1] input (LPIPS scaling
    # layer — equivalent role to the reference's ImageNet mean/std).
    fa = _vgg_features(params, pred * 2.0 - 1.0)
    fb = _vgg_features(params, target * 2.0 - 1.0)
    total = jnp.zeros(())
    for a, b in zip(fa, fb):
        total = total + jnp.mean(jnp.abs(a - b))
    return total


# -- container ---------------------------------------------------------------------

@dataclass
class LossTerm:
    name: str
    fn: Callable[..., jnp.ndarray]
    weight: float = 1.0
    is_metric: bool = False   # metrics are logged but not summed into the loss


class LossContainer:
    """Named weighted loss terms + quality metrics (reference: Losses/Base.py:11-63).

    Use inside a jitted step:
        total, logs = container(name1=dict(pred=..., target=...), ...)
    Accumulation for wandb-interval logging happens on host via ``accumulate``.
    """

    def __init__(self):
        self.terms: dict[str, LossTerm] = {}
        self._accum: dict[str, list[float]] = {}

    def add_loss(self, name: str, fn: Callable, weight: float = 1.0) -> 'LossContainer':
        self.terms[name] = LossTerm(name, fn, weight, is_metric=False)
        return self

    def add_metric(self, name: str, fn: Callable) -> 'LossContainer':
        self.terms[name] = LossTerm(name, fn, 0.0, is_metric=True)
        return self

    def __call__(self, **term_kwargs) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
        total = jnp.zeros(())
        logs: dict[str, jnp.ndarray] = {}
        for name, kwargs in term_kwargs.items():
            if kwargs is None:
                continue
            term = self.terms[name]
            value = term.fn(**kwargs)
            logs[name] = value
            if not term.is_metric:
                total = total + term.weight * value
        logs['total'] = total
        return total, logs

    # -- host-side accumulation for interval logging -------------------------------
    def accumulate(self, logs: dict) -> None:
        for key, value in logs.items():
            self._accum.setdefault(key, []).append(float(value))

    def flush(self) -> dict[str, float]:
        out = {k: sum(v) / len(v) for k, v in self._accum.items() if v}
        self._accum.clear()
        return out
