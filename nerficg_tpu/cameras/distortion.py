"""Radial/tangential lens distortion (OpenCV k1..k6, p1, p2 model).

Reference equivalent: ``RadialTangentialDistortion`` (src/Cameras/utils.py:88-127):
analytic distort, iterative Newton undistort (10 iterations). Implemented as
pure jnp so it can live inside jitted projection/ray-generation code.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

__all__ = ['RadialTangentialDistortion']


@dataclass(frozen=True)
class RadialTangentialDistortion:
    k1: float = 0.0
    k2: float = 0.0
    k3: float = 0.0
    k4: float = 0.0
    k5: float = 0.0
    k6: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    undistort_iterations: int = 10

    def is_identity(self) -> bool:
        return all(abs(v) < 1e-12 for v in
                   (self.k1, self.k2, self.k3, self.k4, self.k5, self.k6,
                    self.p1, self.p2))

    def distort(self, xy: jnp.ndarray) -> jnp.ndarray:
        """Apply distortion to normalized camera-plane coords (..., 2)
        (reference: Cameras/utils.py:107-127). Backend-generic: numpy
        in -> numpy out (host path), jnp in -> jnp (jitted path)."""
        from nerficg_tpu.cameras.base import array_module
        xp = array_module(xy)
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial_num = 1.0 + r2 * (self.k1 + r2 * (self.k2 + r2 * self.k3))
        radial_den = 1.0 + r2 * (self.k4 + r2 * (self.k5 + r2 * self.k6))
        radial = radial_num / radial_den
        xy_prod = x * y
        x_out = x * radial + 2.0 * self.p1 * xy_prod + self.p2 * (r2 + 2.0 * x * x)
        y_out = y * radial + self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * xy_prod
        return xp.stack([x_out, y_out], axis=-1)

    def undistort(self, xy: jnp.ndarray) -> jnp.ndarray:
        """Iterative (fixed-point/Newton-style) inverse of ``distort``
        (reference: Cameras/utils.py:88-105)."""
        if self.is_identity():
            return xy
        result = xy
        for _ in range(self.undistort_iterations):
            distorted = self.distort(result)
            result = result + (xy - distorted)
        return result

    @staticmethod
    def from_colmap(params: dict) -> 'RadialTangentialDistortion':
        return RadialTangentialDistortion(
            k1=float(params.get('k1', 0.0)), k2=float(params.get('k2', 0.0)),
            k3=float(params.get('k3', 0.0)), k4=float(params.get('k4', 0.0)),
            k5=float(params.get('k5', 0.0)), k6=float(params.get('k6', 0.0)),
            p1=float(params.get('p1', 0.0)), p2=float(params.get('p2', 0.0)))
