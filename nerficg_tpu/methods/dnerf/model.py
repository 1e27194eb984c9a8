"""D-NeRF-family dynamic-scene model: deformation field + canonical
Instant-NGP.

Reference equivalent: the reference framework hosts dynamic methods as
sibling-repo plugins implementing the same Model/Renderer/Trainer contract
(SURVEY §2/§2.6); its data model carries per-view timestamps for them
(src/Datasets/utils.py:766 View.timestamp, DNeRF/NvidiaShort/
PlenopticVideoBlender loaders).  This method follows the D-NeRF design
(Pumarola et al.): a time-conditioned deformation MLP warps samples into a
canonical frame evaluated by a static field — here the hash-grid Instant-NGP
field, so the canonical evaluation reuses the crossbar encode kernels.

TPU-first: the deformation is a frequency-encoded MLP evaluated in bf16 on
the MXU for the whole compacted sample batch; at t == 0 the deformation is
identity by construction (zero-init output layer), matching D-NeRF's
canonical-frame convention.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerficg_tpu.core.config import Configurable
from nerficg_tpu.methods.instant_ngp.model import (InstantNGPModel,
                                                   _init_linear, _mlp)
from nerficg_tpu.ops.encoding import frequency_encode

__all__ = ['DNeRFModel']


@Configurable.configure(
    DEFORM_WIDTH=128,
    DEFORM_LAYERS=3,               # hidden layers of the deformation MLP
    DEFORM_POS_FREQUENCIES=6,
    DEFORM_TIME_FREQUENCIES=4,
    # Exact 8-corner encode by default: the deformation field trains
    # through d(encode)/d(position), and the stochastic estimators'
    # straight-through position gradients measurably hurt it
    # (A/B on the procedural dynamic scene: 17.9 vs 12.1 dB at 800 iters).
    STOCHASTIC_CORNERS=0,
    # The windowed gen-3 encode has no position-gradient kernel yet; the
    # deformation field needs d(encode)/d(position) (ops/hash_xbar.py).
    ENCODING_BACKEND='xbar',
)
class DNeRFModel(InstantNGPModel):

    # The deformation field learns through d(encode)/d(position).
    NEEDS_POS_GRAD = True

    def build(self, rng: Optional[jax.Array] = None) -> 'DNeRFModel':
        if rng is None:
            rng = jax.random.PRNGKey(0)
        k_base, k_def = jax.random.split(rng)
        super().build(k_base)
        pf = int(self.DEFORM_POS_FREQUENCIES)
        tf = int(self.DEFORM_TIME_FREQUENCIES)
        in_dim = 3 + 3 * 2 * pf + 1 + 2 * tf
        width = int(self.DEFORM_WIDTH)
        layers = int(self.DEFORM_LAYERS)
        keys = jax.random.split(k_def, layers + 1)
        ws = [_init_linear(keys[0], in_dim, width)]
        for i in range(layers - 1):
            ws.append(_init_linear(keys[i + 1], width, width))
        # Zero-init the output layer: deformation starts as the identity.
        ws.append(jnp.zeros((width, 3), jnp.float32))
        self.params['deform_mlp'] = ws
        return self

    def deform(self, params: dict, positions: jnp.ndarray,
               timestamps: jnp.ndarray) -> jnp.ndarray:
        """(N, 3) world positions + (N,) times -> canonical positions.

        t == 0 is the canonical frame: the offset is gated by the time
        encoding's first-order term only through the MLP, and D-NeRF's
        convention Psi(x, 0) = x is enforced by multiplying with t != 0
        (Pumarola et al., Sec. 3.1).
        """
        t = timestamps.reshape(-1, 1)
        pe = frequency_encode(positions, int(self.DEFORM_POS_FREQUENCIES),
                              include_input=True)
        te = frequency_encode(t, int(self.DEFORM_TIME_FREQUENCIES),
                              include_input=True)
        x = jnp.concatenate([pe, te], axis=-1)
        offset = _mlp(params['deform_mlp'], x)
        return positions + offset * (t != 0.0)

    def density(self, params: dict, positions: jnp.ndarray,
                encode_seed: Optional[jnp.ndarray] = None,
                timestamps: Optional[jnp.ndarray] = None):
        if timestamps is not None:
            positions = self.deform(params, positions, timestamps)
        return super().density(params, positions, encode_seed=encode_seed)

    def field(self, params: dict, positions: jnp.ndarray,
              directions: jnp.ndarray,
              encode_seed: Optional[jnp.ndarray] = None,
              timestamps: Optional[jnp.ndarray] = None):
        sigma, geo = self.density(params, positions,
                                  encode_seed=encode_seed,
                                  timestamps=timestamps)
        rgb = self.color(params, geo, directions)
        return sigma, rgb
