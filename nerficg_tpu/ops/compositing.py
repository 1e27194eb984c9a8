"""Volume-rendering integration (alpha compositing over ray samples).

Reference equivalent: ``integrate_samples`` (src/Methods/NeRF/utils.py:112-136)
and the CUDA composite kernels (VolumeRenderingV2/csrc/volumerendering.cu:7-290).

TPU-first design: instead of the CUDA kernels' variable-length packed segments
with atomic early termination, samples live in a dense padded
(rays, max_samples) layout with a validity mask; transmittance is a cumulative
product along the sample axis (XLA fuses the whole chain into one pass), and
"early termination" becomes multiplication by a transmittance mask — same
math, no data-dependent control flow, MXU/VPU friendly.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

__all__ = ['densities_to_weights', 'composite_rays', 'distortion_loss']


def densities_to_weights(densities: jnp.ndarray, deltas: jnp.ndarray,
                         mask: Optional[jnp.ndarray] = None,
                         early_stop_eps: float = 0.0) -> jnp.ndarray:
    """sigma_i, delta_i -> per-sample compositing weights w_i = T_i * alpha_i.

    densities: (R, S) non-negative volume densities.
    deltas:    (R, S) segment lengths.
    mask:      (R, S) optional sample validity (invalid -> zero contribution).

    T_i = prod_{j<i} (1 - alpha_j), alpha_i = 1 - exp(-sigma_i * delta_i).
    When ``early_stop_eps`` > 0, contributions after transmittance drops below
    the threshold are zeroed (mirrors the CUDA early-termination at T<=1e-4,
    reference: volumerendering.cu:48-55).
    """
    alpha = 1.0 - jnp.exp(-densities * deltas)
    if mask is not None:
        alpha = alpha * mask
    # Exclusive cumulative product of (1 - alpha): T_0 = 1.
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]],
                            axis=-1)
    if early_stop_eps > 0.0:
        alpha = alpha * (trans > early_stop_eps)
    return trans * alpha


def composite_rays(rgb: jnp.ndarray, densities: jnp.ndarray, depths: jnp.ndarray,
                   deltas: jnp.ndarray,
                   background: Optional[jnp.ndarray] = None,
                   mask: Optional[jnp.ndarray] = None,
                   early_stop_eps: float = 0.0) -> dict:
    """Front-to-back compositing of per-sample rgb/density to per-ray outputs.

    rgb:       (R, S, 3) sample colors.
    densities: (R, S) sample densities.
    depths:    (R, S) sample depths along the ray.
    deltas:    (R, S) segment lengths.
    background: (3,) or (R, 3) background color blended by residual
               transmittance (reference: NeRF/utils.py:127-133).

    Returns dict with 'rgb' (R,3), 'depth' (R,1), 'alpha' (R,1), 'weights' (R,S).
    """
    weights = densities_to_weights(densities, deltas, mask, early_stop_eps)
    acc = jnp.sum(weights, axis=-1, keepdims=True)                    # (R, 1)
    out_rgb = jnp.einsum('rs,rsc->rc', weights, rgb)                  # (R, 3)
    # Depth = weighted mean normalized by accumulated alpha (reference:
    # NeRF/utils.py:124-126).
    depth = jnp.sum(weights * depths, axis=-1, keepdims=True) / \
        jnp.maximum(acc, 1e-10)
    if background is not None:
        background = jnp.asarray(background, out_rgb.dtype)
        out_rgb = out_rgb + (1.0 - acc) * background
    return {'rgb': out_rgb, 'depth': depth, 'alpha': acc, 'weights': weights}


def distortion_loss(weights: jnp.ndarray, depths: jnp.ndarray,
                    deltas: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """MipNeRF360 distortion loss on the padded layout.

    Reference equivalent: the CUDA distortion_loss_fw/bw kernels
    (VolumeRenderingV2/csrc/losses.cu:10-174, DVGO-v2 formulation) — here the
    per-segment prefix sums become jnp.cumsum and autodiff provides the
    backward, removing the hand-derived kernel.

    L = sum_ij w_i w_j |m_i - m_j| / 3? -- using the O(S) prefix-sum form:
    L = 2 * sum_i w_i (m_i * A_{i-1} - B_{i-1}) + (1/3) sum_i w_i^2 d_i
    where m_i = interval midpoint, A = cumsum(w), B = cumsum(w*m), d_i = delta.
    """
    if mask is not None:
        weights = weights * mask
    mids = depths  # caller passes midpoints
    w_cum = jnp.cumsum(weights, axis=-1)
    wm_cum = jnp.cumsum(weights * mids, axis=-1)
    # exclusive prefixes
    w_prev = w_cum - weights
    wm_prev = wm_cum - weights * mids
    loss_bi = 2.0 * jnp.sum(weights * (mids * w_prev - wm_prev), axis=-1)
    loss_uni = (1.0 / 3.0) * jnp.sum(weights * weights * deltas, axis=-1)
    return loss_bi + loss_uni
