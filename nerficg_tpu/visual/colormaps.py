"""Color maps for depth / error visualization.

Reference equivalent: src/Visual/ColorMap.py (256-entry LUTs for TURBO /
SPECTRAL / MAGMA / INFERNO / PLASMA / VIRIDIS / CIVIDIS / TWILIGHT with
indexed or interpolated application) and ``apply_color_map``
(src/Visual/utils.py:8-34). LUTs are built from matplotlib's colormap data at
import time instead of shipping the tables as literals.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ['ColorMap', 'apply_color_map']

_MPL_NAMES = {
    'TURBO': 'turbo', 'SPECTRAL': 'Spectral', 'MAGMA': 'magma',
    'INFERNO': 'inferno', 'PLASMA': 'plasma', 'VIRIDIS': 'viridis',
    'CIVIDIS': 'cividis', 'TWILIGHT': 'twilight', 'JET': 'jet',
    'GRAY': 'gray',
}


@lru_cache(maxsize=None)
def _lut(name: str) -> np.ndarray:
    """256x3 float32 LUT."""
    key = name.upper()
    if key not in _MPL_NAMES:
        from nerficg_tpu.core.errors import VisualizationError
        raise VisualizationError(
            f'unknown colormap {name!r}; options: {sorted(_MPL_NAMES)}')
    try:
        import matplotlib
        cmap = matplotlib.colormaps[_MPL_NAMES[key]]
        return cmap(np.linspace(0, 1, 256))[:, :3].astype(np.float32)
    except Exception:
        # Grayscale fallback if matplotlib is unavailable.
        ramp = np.linspace(0, 1, 256, dtype=np.float32)
        return np.stack([ramp, ramp, ramp], axis=-1)


class ColorMap:
    """(reference: Visual/ColorMap.py:8-87)"""

    options = sorted(_MPL_NAMES)

    @staticmethod
    def get(name: str) -> np.ndarray:
        return _lut(name)

    @staticmethod
    def apply(values: jnp.ndarray, name: str = 'TURBO',
              interpolate: bool = True) -> jnp.ndarray:
        """Map values in [0, 1] (..., ) -> colors (..., 3)."""
        lut = jnp.asarray(_lut(name))
        v = jnp.clip(values, 0.0, 1.0)
        if not interpolate:
            idx = jnp.clip((v * 255.0 + 0.5).astype(jnp.int32), 0, 255)
            return lut[idx]
        pos = v * 255.0
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, 255)
        hi = jnp.clip(lo + 1, 0, 255)
        frac = (pos - lo.astype(pos.dtype))[..., None]
        return lut[lo] * (1.0 - frac) + lut[hi] * frac


def apply_color_map(values: jnp.ndarray, name: str = 'TURBO',
                    min_value: float | None = None,
                    max_value: float | None = None,
                    mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Min/max (optionally masked) normalize + colorize
    (reference: Visual/utils.py:8-34)."""
    values = jnp.asarray(values, jnp.float32)
    if values.ndim >= 1 and values.shape[-1] == 1:
        values = values[..., 0]
    if mask is not None:
        masked = jnp.where(mask, values, jnp.nan)
        lo = jnp.nanmin(masked) if min_value is None else min_value
        hi = jnp.nanmax(masked) if max_value is None else max_value
    else:
        lo = jnp.min(values) if min_value is None else min_value
        hi = jnp.max(values) if max_value is None else max_value
    norm = (values - lo) / jnp.maximum(hi - lo, 1e-12)
    colors = ColorMap.apply(norm, name)
    if mask is not None:
        colors = jnp.where(mask[..., None], colors, 0.0)
    return colors
