"""Masked image metrics for dynamic-scene evaluation: mPSNR / mSSIM / mLPIPS.

Reference equivalent: src/Optim/MaskedMetrics.py:36-215 (itself JAX code
adapted from dycheck): PSNR over masked pixels only and SSIM with
partial-convolution windows so statistics never mix masked and unmasked
content. mLPIPS delegates to the optional torch LPIPS path and masks the
per-pixel distance map when available.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['masked_psnr', 'masked_ssim', 'compute_masked_metrics']


def masked_psnr(pred: jnp.ndarray, target: jnp.ndarray,
                mask: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """PSNR over pixels where mask > 0.5 (reference: MaskedMetrics.py:36-60)."""
    mask = (mask > 0.5).astype(pred.dtype)
    if mask.ndim == 2:
        mask = mask[..., None]
    err = ((pred - target) ** 2) * mask
    denom = jnp.maximum(jnp.sum(mask) * pred.shape[-1] / mask.shape[-1], 1.0)
    mse = jnp.sum(err) / denom
    return -10.0 * jnp.log10(jnp.maximum(mse / max_val ** 2, 1e-12))


def _partial_window_mean(x: jnp.ndarray, mask: jnp.ndarray,
                         size: int) -> jnp.ndarray:
    """Windowed mean counting only unmasked pixels (partial convolution)."""
    kernel = jnp.ones((1, 1, size, size), x.dtype)
    c = x.shape[-1]

    def conv(img):
        t = img.transpose(2, 0, 1)[None]                      # (1, C, H, W)
        k = jnp.broadcast_to(kernel, (t.shape[1], 1, size, size))
        dn = jax.lax.conv_dimension_numbers(t.shape, k.shape,
                                            ('NCHW', 'OIHW', 'NCHW'))
        out = jax.lax.conv_general_dilated(t, k, (1, 1), 'VALID',
                                           dimension_numbers=dn,
                                           feature_group_count=t.shape[1])
        return out[0].transpose(1, 2, 0)

    sums = conv(x * mask)
    counts = conv(jnp.broadcast_to(mask, x.shape))
    return sums / jnp.maximum(counts, 1e-8), counts


def masked_ssim(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray,
                max_val: float = 1.0, window: int = 11,
                k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """SSIM with partial-conv window statistics over the mask
    (reference: MaskedMetrics.py:80-160)."""
    mask = (mask > 0.5).astype(pred.dtype)
    if mask.ndim == 2:
        mask = mask[..., None]
    mu_p, counts = _partial_window_mean(pred, mask, window)
    mu_t, _ = _partial_window_mean(target, mask, window)
    mu_pp, _ = _partial_window_mean(pred * pred, mask, window)
    mu_tt, _ = _partial_window_mean(target * target, mask, window)
    mu_pt, _ = _partial_window_mean(pred * target, mask, window)
    var_p = mu_pp - mu_p * mu_p
    var_t = mu_tt - mu_t * mu_t
    cov = mu_pt - mu_p * mu_t
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * cov + c2)) / \
               ((mu_p ** 2 + mu_t ** 2 + c1) * (var_p + var_t + c2))
    # Count a window only if it contains any unmasked pixel.
    valid = (counts > 0.5).astype(pred.dtype)
    return jnp.sum(ssim_map * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def compute_masked_metrics(pred: np.ndarray, target: np.ndarray,
                           mask: np.ndarray) -> dict[str, float]:
    """mPSNR / mSSIM / mLPIPS for one image (reference API:
    generate_tables.py uses these for dynamic-scene tables)."""
    p = jnp.asarray(pred, jnp.float32)
    t = jnp.asarray(target, jnp.float32)
    m = jnp.asarray(mask, jnp.float32)
    out = {'mPSNR': float(masked_psnr(p, t, m)),
           'mSSIM': float(masked_ssim(p, t, m))}
    from nerficg_tpu.optim.metrics import lpips_available
    if lpips_available():
        from nerficg_tpu.optim.metrics import lpips
        mask3 = np.asarray(mask)
        if mask3.ndim == 2:
            mask3 = mask3[..., None]
        out['mLPIPS'] = lpips(np.asarray(pred) * mask3,
                              np.asarray(target) * mask3)
    else:
        out['mLPIPS'] = float('nan')
    return out
