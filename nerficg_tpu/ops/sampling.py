"""Ray sample generation: stratified and hierarchical (inverse-CDF) sampling.

Reference equivalent: src/Methods/NeRF/utils.py:57-110
(``generate_samples`` / ``generate_samples_from_pdf``). Pure jnp, fully
batched over rays — runs on the VPU inside the jitted train/render step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ['stratified_samples', 'sample_pdf', 'merge_sorted_samples']


def stratified_samples(rng: jax.Array, num_rays: int, num_samples: int,
                       near: jnp.ndarray | float, far: jnp.ndarray | float,
                       randomized: bool = True) -> jnp.ndarray:
    """Stratified depth samples in [near, far] -> (num_rays, num_samples)
    (reference: NeRF/utils.py:57-76)."""
    bins = jnp.linspace(0.0, 1.0, num_samples + 1)
    lower, upper = bins[:-1], bins[1:]
    if randomized:
        u = jax.random.uniform(rng, (num_rays, num_samples))
    else:
        u = jnp.full((num_rays, num_samples), 0.5)
    t = lower[None, :] + (upper - lower)[None, :] * u
    near = jnp.broadcast_to(jnp.asarray(near, jnp.float32), (num_rays,))[:, None]
    far = jnp.broadcast_to(jnp.asarray(far, jnp.float32), (num_rays,))[:, None]
    return near + (far - near) * t


def sample_pdf(rng: jax.Array, bins: jnp.ndarray, weights: jnp.ndarray,
               num_samples: int, randomized: bool = True,
               eps: float = 1e-5) -> jnp.ndarray:
    """Inverse-CDF sampling of new depths from per-segment weights
    (reference: NeRF/utils.py:78-110, hierarchical NeRF sampling).

    Args:
      bins: (R, S+1) segment boundaries (sorted ascending).
      weights: (R, S) non-negative segment weights.
      num_samples: number of new samples per ray.

    Returns:
      (R, num_samples) new depth samples.
    """
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (R, S+1)

    num_rays = bins.shape[0]
    if randomized:
        u = jax.random.uniform(rng, (num_rays, num_samples))
    else:
        u = jnp.broadcast_to(jnp.linspace(eps, 1.0 - eps, num_samples),
                             (num_rays, num_samples))

    # searchsorted per ray: index of the cdf bin containing each u.
    idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side='right'))(cdf, u)
    below = jnp.clip(idx - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(idx, 0, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, jnp.clip(below, 0, bins.shape[-1] - 1),
                                     axis=-1)
    bins_above = jnp.take_along_axis(bins, jnp.clip(above, 0, bins.shape[-1] - 1),
                                     axis=-1)
    denom = jnp.where(cdf_above - cdf_below < eps, 1.0, cdf_above - cdf_below)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def merge_sorted_samples(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Merge two per-ray sample sets and sort ascending
    (reference: NeRF/Renderer.py:60-70's coarse+fine merge)."""
    return jnp.sort(jnp.concatenate([a, b], axis=-1), axis=-1)
