"""D-NeRF renderer: Instant-NGP marching with time-conditioned deformation.

The marching/compositing machinery is inherited from the Instant-NGP
renderer (occupancy skipping, packed compositing, stochastic encode); only
the field-evaluation hook changes: samples are warped to the canonical
frame using their owning ray's timestamp before the hash field is queried.

Occupancy over time: each grid refresh queries the field at one random
timestamp; the EMA-max accumulation across refreshes approximates the
time-union occupancy the dynamic scene needs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nerficg_tpu.core.config import Configurable
from nerficg_tpu.methods.dnerf.model import DNeRFModel
from nerficg_tpu.methods.instant_ngp.renderer import InstantNGPRenderer

__all__ = ['DNeRFRenderer']


@Configurable.configure()
class DNeRFRenderer(InstantNGPRenderer):

    MODEL_CLASS = DNeRFModel

    def _field(self, params, positions, directions, encode_seed,
               sample_times, anchor_keys=None):
        # anchor_keys are dropped: the deformation moves samples off the
        # marcher's morton stream, and the xbar backend has no windows.
        return self.model.field(params, positions, directions,
                                encode_seed=encode_seed,
                                timestamps=sample_times)

    def _update_grid_impl(self, params, density_grid, rng, carve_mask=None,
                          warmup: bool = False):
        # One random timestamp per refresh; EMA-max unions over time.
        t_key = jax.random.fold_in(rng, 13)
        t = jax.random.uniform(t_key, ())
        seed = jax.random.randint(jax.random.fold_in(rng, 11), (1, 1),
                                  0, 2**31 - 1, jnp.int32)

        def query(positions):
            times = jnp.full((positions.shape[0],), t)
            sigma, _ = self.model.density(params, positions,
                                          encode_seed=seed,
                                          timestamps=times)
            return sigma

        from nerficg_tpu.ops.occupancy import (cascade_cell_positions,
                                               update_density_grid)
        position_fn = None
        if self._cascades > 1:
            position_fn = lambda cells, offs: cascade_cell_positions(
                cells, offs, self.model.center, float(self.model.SCALE),
                int(self.model.GRID_RESOLUTION), self._cascades)
        return update_density_grid(
            density_grid, query, self.model.aabb_min, self.model.aabb_max,
            int(self.model.GRID_RESOLUTION), rng,
            num_samples=int(self.OCCUPANCY_SAMPLES),
            decay=float(self.OCCUPANCY_DECAY), warmup=warmup,
            position_fn=position_fn, carve_mask=carve_mask)
