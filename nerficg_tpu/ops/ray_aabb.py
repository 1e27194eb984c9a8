"""Ray/AABB and ray/sphere intersection — vectorized slab tests.

Reference equivalent: the CUDA intersection kernels
(VolumeRenderingV2/csrc/intersection.cu:5-196). With a single scene AABB this
is a pure elementwise VPU op; no kernel or atomic hit-counting needed.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ['ray_aabb_intersect', 'ray_sphere_intersect']


def ray_aabb_intersect(origins: jnp.ndarray, directions: jnp.ndarray,
                       aabb_min: jnp.ndarray, aabb_max: jnp.ndarray,
                       min_near: float = 0.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-test entry/exit t per ray (reference: intersection.cu:5-101).

    Returns (t_near, t_far), with t_near > t_far marking a miss.
    """
    inv_dir = 1.0 / jnp.where(jnp.abs(directions) < 1e-10,
                              jnp.where(directions >= 0, 1e-10, -1e-10),
                              directions)
    t0 = (aabb_min - origins) * inv_dir
    t1 = (aabb_max - origins) * inv_dir
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_near = jnp.maximum(t_near, min_near)
    return t_near, t_far


def ray_sphere_intersect(origins: jnp.ndarray, directions: jnp.ndarray,
                         center: jnp.ndarray, radius: float,
                         min_near: float = 0.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Analytic ray/sphere entry/exit t (reference: intersection.cu:103-196)."""
    oc = origins - center
    b = jnp.sum(oc * directions, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - c
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = jnp.where(disc >= 0, -b - sqrt_disc, 1.0)
    t_far = jnp.where(disc >= 0, -b + sqrt_disc, 0.0)
    return jnp.maximum(t_near, min_near), t_far
