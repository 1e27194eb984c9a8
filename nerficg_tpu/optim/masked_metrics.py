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


def _conv_1d(img: jnp.ndarray, kernel_2d: jnp.ndarray) -> jnp.ndarray:
    """VALID per-channel 2-D convolution of (H, W, C) with one small kernel."""
    t = img.transpose(2, 0, 1)[None]                          # (1, C, H, W)
    kh, kw = kernel_2d.shape
    k = jnp.broadcast_to(kernel_2d[None, None],
                         (t.shape[1], 1, kh, kw))
    dn = jax.lax.conv_dimension_numbers(t.shape, k.shape,
                                        ('NCHW', 'OIHW', 'NCHW'))
    out = jax.lax.conv_general_dilated(
        t, k, (1, 1), 'VALID', dimension_numbers=dn,
        feature_group_count=t.shape[1],
        precision=jax.lax.Precision.HIGHEST)
    return out[0].transpose(1, 2, 0)


def _partial_filter(x: jnp.ndarray, mask: jnp.ndarray, filt: jnp.ndarray
                    ) -> jnp.ndarray:
    """dycheck-protocol separable partial-convolution Gaussian filter.

    Each 1-D pass computes conv(x * m, gauss) renormalized by the VALID
    pixel count under a ones kernel (scaled by the filter size), with the
    mask rebinarized between passes — matching the reference's
    MaskedMetrics.compute_ssim (itself dycheck's partial-conv SSIM,
    Liu et al. ECCV 2018 formulation).
    """
    size = filt.shape[0]
    ones = jnp.ones((size,), x.dtype)

    def one_pass(z, m, horizontal):
        f2 = filt[None, :] if horizontal else filt[:, None]
        o2 = ones[None, :] if horizontal else ones[:, None]
        z_ = _conv_1d(z * m, f2)
        m_ = _conv_1d(m, o2)
        z_out = jnp.where(m_ != 0, z_ * float(size) / jnp.maximum(m_, 1e-12),
                          0.0)
        return z_out, (m_ != 0).astype(x.dtype)

    m3 = jnp.broadcast_to(mask, x.shape)
    z, m = one_pass(x, m3, True)
    z, _ = one_pass(z, m, False)
    return z


def masked_ssim(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray,
                max_val: float = 1.0, window: int = 11,
                filter_sigma: float = 1.5,
                k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """SSIM with Gaussian-window (sigma=1.5) partial-conv statistics,
    matching the dycheck protocol used by the reference
    (src/Optim/MaskedMetrics.py compute_ssim) so dynamic-scene mSSIM
    numbers are comparable to published tables. Quirks preserved: masked
    windows degenerate to zeros and contribute SSIM = 1, and the final
    score is the mean over ALL windows."""
    mask = (mask > 0.5).astype(pred.dtype)
    if mask.ndim == 2:
        mask = mask[..., None]
    hw = window // 2
    shift = (2 * hw - window + 1) / 2
    f_i = ((jnp.arange(window) - hw + shift) / filter_sigma) ** 2
    filt = jnp.exp(-0.5 * f_i)
    filt = filt / jnp.sum(filt)

    mu_p = _partial_filter(pred, mask, filt)
    mu_t = _partial_filter(target, mask, filt)
    s_pp = jnp.maximum(_partial_filter(pred * pred, mask, filt)
                       - mu_p * mu_p, 0.0)
    s_tt = jnp.maximum(_partial_filter(target * target, mask, filt)
                       - mu_t * mu_t, 0.0)
    s_pt = _partial_filter(pred * target, mask, filt) - mu_p * mu_t
    s_pt = jnp.sign(s_pt) * jnp.minimum(jnp.sqrt(s_pp * s_tt),
                                        jnp.abs(s_pt))
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * s_pt + c2)) / \
               ((mu_p ** 2 + mu_t ** 2 + c1) * (s_pp + s_tt + c2))
    return jnp.mean(ssim_map)


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
