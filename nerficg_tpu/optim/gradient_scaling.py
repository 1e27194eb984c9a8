"""Distance-based gradient scaling for near-camera floater suppression.

Reference equivalent: src/Optim/gradient_scaling.py:6-27 — the
"gradient-scaling.github.io" trick: scale sample gradients by clamped
squared distance to the camera so near-field floaters don't dominate early
training. In JAX this is a custom_vjp identity whose backward multiplies
the cotangent by the per-sample factor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ['scale_gradients_by_distance']


@jax.custom_vjp
def scale_gradients_by_distance(values: jnp.ndarray,
                                distances: jnp.ndarray) -> jnp.ndarray:
    """Identity on ``values``; backward scales grads by clamp(distances^2, 0, 1).

    values: (..., C) per-sample quantities (e.g. rgb or density).
    distances: (...,) sample distance from the camera origin.
    """
    return values


def _fwd(values, distances):
    return values, distances


def _bwd(distances, g):
    factor = jnp.clip(distances * distances, 0.0, 1.0)
    return g * factor[..., None] if g.ndim > distances.ndim else g * factor, None


scale_gradients_by_distance.defvjp(_fwd, _bwd)
