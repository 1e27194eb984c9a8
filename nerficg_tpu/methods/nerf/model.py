"""Vanilla NeRF model: frequency encoding + 8x256 skip MLP, coarse+fine blocks.

Reference equivalent: src/Methods/NeRF/Model.py:10-128 (``NeRFBlock`` with
position 10-freq / direction 4-freq encodings, 8x256 trunk with input skip at
layer 5, density head with optional pre-activation noise, feature+direction ->
sigmoid RGB head; model = optional coarse block + fine block).

TPU-first: parameters are a plain pytree; evaluation is a pure batched
function whose matmuls map straight onto the MXU. Compute runs in bfloat16
with float32 accumulation (preferred_element_type) — the TPU replacement for
the reference's fp32 torch MLP.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nerficg_tpu.core.config import Configurable
from nerficg_tpu.methods.base.model import BaseModel
from nerficg_tpu.ops.encoding import frequency_encode, frequency_encoding_dim

__all__ = ['NeRFModel', 'init_nerf_block', 'apply_nerf_block']


def _init_linear(rng: jax.Array, in_dim: int, out_dim: int) -> dict:
    """He-uniform init matching torch.nn.Linear defaults."""
    w_rng, b_rng = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(in_dim)
    return {
        'w': jax.random.uniform(w_rng, (in_dim, out_dim), jnp.float32,
                                -bound, bound),
        'b': jax.random.uniform(b_rng, (out_dim,), jnp.float32, -bound, bound),
    }


def _linear(params: dict, x: jnp.ndarray,
            compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """MXU matmul: bf16 inputs/weights, f32 accumulation."""
    y = jnp.dot(x.astype(compute_dtype), params['w'].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    return y + params['b']


def init_nerf_block(rng: jax.Array, num_layers: int = 8, width: int = 256,
                    skip_layer: int = 5, pos_freqs: int = 10,
                    dir_freqs: int = 4, feature_dim: int | None = None) -> dict:
    """Parameter pytree for one NeRF block (reference: NeRF/Model.py:10-94)."""
    feature_dim = width if feature_dim is None else feature_dim
    pos_dim = frequency_encoding_dim(3, pos_freqs)
    dir_dim = frequency_encoding_dim(3, dir_freqs)
    rngs = jax.random.split(rng, num_layers + 4)
    trunk = []
    in_dim = pos_dim
    for i in range(num_layers):
        if i == skip_layer:
            in_dim += pos_dim
        trunk.append(_init_linear(rngs[i], in_dim, width))
        in_dim = width
    return {
        'trunk': trunk,
        'density': _init_linear(rngs[num_layers], width, 1),
        'feature': _init_linear(rngs[num_layers + 1], width, feature_dim),
        'color_hidden': _init_linear(rngs[num_layers + 2],
                                     feature_dim + dir_dim, width // 2),
        'color_out': _init_linear(rngs[num_layers + 3], width // 2, 3),
    }


def apply_nerf_block(params: dict, positions: jnp.ndarray,
                     directions: jnp.ndarray,
                     skip_layer: int = 5, pos_freqs: int = 10,
                     dir_freqs: int = 4,
                     density_noise_rng: Optional[jax.Array] = None,
                     density_noise_std: float = 0.0
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate one block: (N, 3) pos + (N, 3) dir -> (density (N,), rgb (N, 3)).

    (reference: NeRF/Model.py:59-94 forward)
    """
    pos_enc = frequency_encode(positions, pos_freqs)
    dir_enc = frequency_encode(directions, dir_freqs)
    x = pos_enc
    for i, layer in enumerate(params['trunk']):
        if i == skip_layer:
            x = jnp.concatenate([x, pos_enc], axis=-1)
        x = jax.nn.relu(_linear(layer, x))
    raw_density = _linear(params['density'], x)[..., 0]
    if density_noise_rng is not None and density_noise_std > 0.0:
        raw_density = raw_density + density_noise_std * \
            jax.random.normal(density_noise_rng, raw_density.shape)
    density = jax.nn.relu(raw_density)
    feature = _linear(params['feature'], x)
    h = jax.nn.relu(_linear(params['color_hidden'],
                            jnp.concatenate([feature, dir_enc], axis=-1)))
    rgb = jax.nn.sigmoid(_linear(params['color_out'], h))
    return density, rgb


@Configurable.configure(
    NUM_LAYERS=8,
    WIDTH=256,
    SKIP_LAYER=5,
    POSITION_FREQUENCIES=10,
    DIRECTION_FREQUENCIES=4,
    USE_COARSE=True,
    DENSITY_NOISE_STD=0.0,
)
class NeRFModel(BaseModel):
    """Coarse + fine NeRF blocks (reference: NeRF/Model.py:97-128)."""

    def build(self, rng: Optional[jax.Array] = None) -> 'NeRFModel':
        if rng is None:
            rng = jax.random.PRNGKey(0)
        coarse_rng, fine_rng = jax.random.split(rng)
        kwargs = dict(num_layers=int(self.NUM_LAYERS), width=int(self.WIDTH),
                      skip_layer=int(self.SKIP_LAYER),
                      pos_freqs=int(self.POSITION_FREQUENCIES),
                      dir_freqs=int(self.DIRECTION_FREQUENCIES))
        self.params = {'fine': init_nerf_block(fine_rng, **kwargs)}
        if self.USE_COARSE:
            self.params['coarse'] = init_nerf_block(coarse_rng, **kwargs)
        return self

    def apply(self, params: dict, block: str, positions: jnp.ndarray,
              directions: jnp.ndarray,
              density_noise_rng: Optional[jax.Array] = None) -> tuple:
        return apply_nerf_block(
            params[block], positions, directions,
            skip_layer=int(self.SKIP_LAYER),
            pos_freqs=int(self.POSITION_FREQUENCIES),
            dir_freqs=int(self.DIRECTION_FREQUENCIES),
            density_noise_rng=density_noise_rng,
            density_noise_std=float(self.DENSITY_NOISE_STD))
