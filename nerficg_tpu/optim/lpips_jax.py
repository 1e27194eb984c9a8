"""On-device LPIPS (VGG16 backbone) in pure JAX.

Reference equivalent: the torchmetrics LPIPS(VGG) metric used by
src/Methods/Base/Renderer.py:103-161 and the wandb sweep logging
(Trainer.py:353-395).

The LPIPS computation (Zhang et al. 2018): normalize both images with the
ImageNet statistics LPIPS uses (scale/shift in [-1,1] space), run them
through the VGG16 feature trunk, unit-normalize each activation along
channels, and average the linear-weighted squared differences over space
and layers:

    d(x, y) = sum_l mean_hw || w_l * (phi_l(x)^ - phi_l(y)^) ||_2^2

Weights: this environment has no network egress and ships no pretrained
VGG16/LPIPS checkpoints, so the module loads them from an ``.npz`` at
``NERFICG_LPIPS_WEIGHTS`` (or ``~/.cache/nerficg_tpu/lpips_vgg.npz``).
``save_weights_npz`` converts the torchvision VGG16 + lpips package
tensors into that file on a machine that has them.  Without weights the
metric reports NaN (mirroring the reference's behavior when the optional
dependency is missing).  All math is weight-independent and unit-tested
with random weights.
"""

from __future__ import annotations

import functools
import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['lpips_jax', 'lpips_weights_available', 'init_random_weights',
           'save_weights_npz', 'load_weights']

# VGG16 feature trunk: conv counts per block; LPIPS taps the last ReLU of
# each block (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
_VGG_CFG = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))

# LPIPS input normalization constants (the 'scaling layer').
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_ENV_KEY = 'NERFICG_LPIPS_WEIGHTS'
_DEFAULT_PATH = Path.home() / '.cache' / 'nerficg_tpu' / 'lpips_vgg.npz'


def _conv(x, w, b):
    """NHWC conv3x3 stride 1 SAME + bias; w (3, 3, Cin, Cout)."""
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return out + b


def _vgg_features(params, x):
    """x (N, H, W, 3) in [-1, 1] -> list of 5 block activations."""
    h = (x - _SHIFT) / _SCALE
    feats = []
    i = 0
    for n_convs, _ in _VGG_CFG:
        for _ in range(n_convs):
            h = jax.nn.relu(_conv(h, params[f'conv{i}_w'],
                                  params[f'conv{i}_b']))
            i += 1
        feats.append(h)
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')
    return feats


@functools.partial(jax.jit, static_argnames=())
def _lpips_impl(params, pred, target):
    fa = _vgg_features(params, pred[None] * 2.0 - 1.0)
    fb = _vgg_features(params, target[None] * 2.0 - 1.0)
    total = jnp.zeros(())
    for layer, (a, b) in enumerate(zip(fa, fb)):
        an = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
        bn = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
        diff = (an - bn) ** 2
        lin = params[f'lin{layer}']                  # (C,) >= 0
        total = total + jnp.mean(jnp.sum(diff * lin, axis=-1))
    return total


_weights_cache: Optional[dict] = None
_weights_checked = False


def load_weights(path: Optional[str] = None) -> Optional[dict]:
    global _weights_cache, _weights_checked
    if _weights_cache is not None:
        return _weights_cache
    if _weights_checked and path is None:
        return None
    _weights_checked = True
    p = Path(path or os.environ.get(_ENV_KEY, _DEFAULT_PATH))
    if not p.is_file():
        return None
    data = np.load(p)
    _weights_cache = {k: jnp.asarray(data[k]) for k in data.files}
    return _weights_cache


def lpips_weights_available() -> bool:
    return load_weights() is not None


def lpips_jax(pred: np.ndarray, target: np.ndarray,
              params: Optional[dict] = None) -> float:
    """LPIPS-VGG of two (H, W, 3) float [0,1] images on device.

    Returns NaN when no weights are available (see module docstring)."""
    params = params if params is not None else load_weights()
    if params is None:
        return float('nan')
    return float(_lpips_impl(params, jnp.asarray(pred, jnp.float32),
                             jnp.asarray(target, jnp.float32)))


def init_random_weights(rng: jax.Array) -> dict:
    """Random weights with the correct shapes (tests / smoke only)."""
    params = {}
    cin = 3
    i = 0
    keys = jax.random.split(rng, 32)
    for n_convs, cout in _VGG_CFG:
        for _ in range(n_convs):
            params[f'conv{i}_w'] = jax.random.normal(
                keys[i], (3, 3, cin, cout)) * np.sqrt(2.0 / (9 * cin))
            params[f'conv{i}_b'] = jnp.zeros((cout,))
            cin = cout
            i += 1
    for layer, (_, cout) in enumerate(_VGG_CFG):
        params[f'lin{layer}'] = jnp.abs(
            jax.random.normal(keys[16 + layer], (cout,))) * 0.01
    return params


def save_weights_npz(path: str) -> None:  # pragma: no cover - needs torch
    """Convert torchvision VGG16 + lpips linear heads to the npz format.

    Run on a machine with `torchvision` and `lpips` installed:
        python -c "from nerficg_tpu.optim.lpips_jax import save_weights_npz;
                   save_weights_npz('lpips_vgg.npz')"
    """
    import lpips as lpips_pkg
    import torch
    model = lpips_pkg.LPIPS(net='vgg', verbose=False)
    out = {}
    convs = [m for m in model.net.slice1] + [m for m in model.net.slice2] + \
        [m for m in model.net.slice3] + [m for m in model.net.slice4] + \
        [m for m in model.net.slice5]
    i = 0
    for m in convs:
        if isinstance(m, torch.nn.Conv2d):
            # torch OIHW -> HWIO
            out[f'conv{i}_w'] = m.weight.detach().permute(
                2, 3, 1, 0).numpy()
            out[f'conv{i}_b'] = m.bias.detach().numpy()
            i += 1
    for layer, lin in enumerate(model.lins):
        out[f'lin{layer}'] = lin.model[-1].weight.detach()[0, :, 0, 0].numpy()
    np.savez(path, **out)
