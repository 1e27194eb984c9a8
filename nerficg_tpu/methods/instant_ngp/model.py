"""Instant-NGP model: hash-grid encoding + small fused MLPs + occupancy grid.

Reference equivalent: src/Methods/InstantNGP/Model.py:31-123 — tcnn
NetworkWithInputEncoding (16-level hash grid, 2^19 table, base 16 -> 2048) +
1x64 density MLP producing [sigma, 15 features]; SH degree-4 direction
encoding + 2x64 color MLP -> sigmoid RGB; 128^3 occupancy grid buffers;
MLP weight decay over the padded tcnn layout (here: plain L2 over MLP params).

TPU-first: the whole field evaluation is one jitted function — hash gathers,
two small matmul chains in bf16 with f32 accumulation. At 64-wide the MLPs
map directly onto the MXU when the sample batch is large (SURVEY §2.12 N11).
Density activation is the truncated exponential from the paper.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerficg_tpu.core.config import Configurable
from nerficg_tpu.methods.base.model import BaseModel
from nerficg_tpu.ops.encoding import sh_encode
from nerficg_tpu.ops.hash_xbar import (hash_encode_xbar,
                                       hash_encode_xbar_posgrad,
                                       hash_encode_xbar_stochastic,
                                       hash_encode_xbar_stochastic_posgrad)
from nerficg_tpu.ops.hashgrid import HashGridConfig, init_hash_grid_mxu

__all__ = ['InstantNGPModel', 'trunc_exp']


@jax.custom_jvp
def trunc_exp(x):
    """exp with clamped gradient (Instant-NGP 'TruncExp')."""
    return jnp.exp(jnp.clip(x, -15.0, 15.0))


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = jnp.exp(jnp.clip(x, -15.0, 15.0))
    return y, y * dx


def _init_linear(rng, in_dim, out_dim):
    # He-uniform, no bias (tcnn FullyFusedMLP has no biases).
    bound = float(np.sqrt(6.0 / in_dim))
    return jax.random.uniform(rng, (in_dim, out_dim), jnp.float32,
                              -bound, bound)


def _mlp(ws, x, compute_dtype=jnp.bfloat16):
    """ReLU MLP over a list of weight matrices (last layer linear)."""
    for i, w in enumerate(ws):
        x = jnp.dot(x.astype(compute_dtype), w.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        if i + 1 < len(ws):
            x = jax.nn.relu(x)
    return x


def _mlp_featT(ws, x_t, compute_dtype=jnp.bfloat16):
    """ReLU MLP whose input arrives FEATURE-MAJOR (F, N) — the windowed hash
    encode's natural layout. The first matmul contracts the leading axis via
    dot_general, so XLA folds the layout into the MXU feed instead of paying
    a 33 MB transpose on the activations (and on their cotangent)."""
    x = jax.lax.dot_general(
        x_t.astype(compute_dtype), ws[0].astype(compute_dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    if len(ws) > 1:
        x = jax.nn.relu(x)
    return _mlp(ws[1:], x, compute_dtype) if len(ws) > 1 else x


@Configurable.configure(
    NUM_LEVELS=16,
    FEATURES_PER_LEVEL=2,
    # 2^14 per level (reference tcnn default is 2^19): random access beyond
    # the lane crossbar has no fast TPU primitive (PERF_NOTES.md), so larger
    # tables pay linearly in the S-loop/one-hot row count.
    LOG2_HASHMAP_SIZE=14,
    # 'window' = gen-3 windowed sorted-stream encode (ops/hash_window.py):
    #   vertex-SHARED corner features, tcnn's parameterization. DEFAULT by
    #   the round-5 capacity-quality A/B (PERF_NOTES round-5): at equal
    #   entry count each shared vertex serves 8 cells, so window measures
    #   14.91 dB vs cell's 11.34 at 2^14 on the textured probe (+3.6 dB
    #   for ~+45% step time). Scan cost grows ~sqrt-ish with capacity —
    #   beyond ~2^16 switch to 'cell'.
    # 'cell'   = gen-4 cell-packed windowed encode (ops/hash_cell.py): one
    #   hash/window address per sample, all 8 corners latched from one
    #   (8, 128) row block, EXACT 8-corner interpolation always, and scan
    #   cost flat in table capacity up to the reference's 2^19 — the
    #   THROUGHPUT backend (bench.py headline) and the parity-config
    #   choice at 2^19, where it matches window's quality (14.79 vs
    #   14.93 dB) at ~2.7x less step time.
    # 'xbar' = gen-2 full-scan crossbar encode (ops/hash_xbar.py; required
    #   for NEEDS_POS_GRAD methods until the windowed posgrad kernel lands).
    ENCODING_BACKEND='window',
    # Training-time stochastic trilinear interpolation: number of corners
    # evaluated per (sample, level) — 1, 2, or 4 (unbiased estimators with
    # decreasing variance, see ops/hash_xbar.py), or 0 for the exact
    # 8-corner path. Inference/eval always uses the exact path.
    # Default 4: the measured A/B (128^2 probe, 6k iters — README round-3
    # table) puts 4-corner within 0.22 dB of exact (16.40 vs 16.62) while
    # 2-corner loses 1.6 dB and 1-corner 4.8 dB. 0 selects the exact
    # 8-corner path; 1/2 are explicit speed knobs.
    STOCHASTIC_CORNERS=4,
    # Samples per compacted march block (must match RENDERER.MARCH_BLOCK):
    # the windowed encode takes its per-sub-block table windows over one
    # anchor per block, which keeps windows tight on the marcher's
    # block-sorted stream (see ops/hashgrid.HashGridConfig.anchor_stride).
    ENCODE_ANCHOR_STRIDE=8,
    BASE_RESOLUTION=16,
    TARGET_RESOLUTION=2048,
    DENSITY_MLP_WIDTH=64,
    DENSITY_MLP_LAYERS=1,          # hidden layers (reference: 1x64)
    GEO_FEATURES=15,
    COLOR_MLP_WIDTH=64,
    COLOR_MLP_LAYERS=2,
    SH_DEGREE=4,
    GRID_RESOLUTION=128,
    SCALE=0.5,                     # half-extent of the scene box around center
    CENTER=[0.0, 0.0, 0.0],
)
class InstantNGPModel(BaseModel):

    # Dynamic methods (deformation fields) override this so the hash encode
    # backward also produces position gradients (ops/hash_xbar.py).
    NEEDS_POS_GRAD = False

    def build(self, rng: Optional[jax.Array] = None) -> 'InstantNGPModel':
        if rng is None:
            rng = jax.random.PRNGKey(0)
        self.hash_config = HashGridConfig(
            num_levels=int(self.NUM_LEVELS),
            features_per_level=int(self.FEATURES_PER_LEVEL),
            log2_table_size=int(self.LOG2_HASHMAP_SIZE),
            base_resolution=int(self.BASE_RESOLUTION),
            target_resolution=int(self.TARGET_RESOLUTION),
            anchor_stride=int(self.ENCODE_ANCHOR_STRIDE)
            if str(self.ENCODING_BACKEND) in ('window', 'cell') else 1)
        k_table, k_d1, k_d2, k_c1, k_c2, k_c3 = jax.random.split(rng, 6)
        hdim = self.hash_config.output_dim
        dw, geo = int(self.DENSITY_MLP_WIDTH), int(self.GEO_FEATURES)
        cw = int(self.COLOR_MLP_WIDTH)
        sh_dim = int(self.SH_DEGREE) ** 2
        self.params = {
            'hash_table': init_hash_grid_mxu(k_table, self.hash_config),
            'density_mlp': [_init_linear(k_d1, hdim, dw),
                            _init_linear(k_d2, dw, 1 + geo)],
            'color_mlp': [_init_linear(k_c1, sh_dim + geo, cw),
                          _init_linear(k_c2, cw, cw),
                          _init_linear(k_c3, cw, 3)],
        }
        resolution = int(self.GRID_RESOLUTION)
        # Multi-cascade occupancy for unbounded scenes: cascade c covers the
        # box of half-extent SCALE * 2^(c - (C-1)); cascade C-1 is the full
        # scene box (reference: InstantNGP/Model.py:53-57).
        from nerficg_tpu.ops.occupancy import num_cascades
        self.cascades = num_cascades(float(self.SCALE))
        self.buffers = {
            'density_grid': jnp.zeros((self.cascades * resolution ** 3,),
                                      jnp.float32),
        }
        center = np.asarray(self.CENTER, np.float32)
        scale = float(self.SCALE)
        self.center = jnp.asarray(center, jnp.float32)
        self.aabb_min = jnp.asarray(center - scale, jnp.float32)
        self.aabb_max = jnp.asarray(center + scale, jnp.float32)
        return self

    # rebuild derived fields after load()
    @classmethod
    def load(cls, path, config=None):
        model = super().load(path, config)
        rebuilt = cls(model._config if model._config is not None else None,
                      name=model.model_name)
        # Re-derive static fields, keep loaded params/buffers.
        params, buffers = model.params, model.buffers
        iters = model.num_iterations_trained
        model = rebuilt
        model.build()
        model.params = params
        model.buffers = buffers
        model.num_iterations_trained = iters
        return model

    # -- field evaluation (pure) ----------------------------------------------
    def density(self, params: dict, positions: jnp.ndarray,
                encode_seed: Optional[jnp.ndarray] = None,
                anchor_keys: Optional[jnp.ndarray] = None
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """positions (N,3) world -> (density (N,), geo features (N, GEO)).

        encode_seed: optional int32 scalar array; when given (training
        steps) and STOCHASTIC_CORNERS > 0, the hash encode evaluates only
        STOCHASTIC_CORNERS sampled corners per (sample, level) — an
        unbiased estimator of the trilinear interpolation
        (see ops/hash_xbar.py).
        """
        unit = (positions - self.aabb_min) / (self.aabb_max - self.aabb_min)
        unit = jnp.clip(unit, 0.0, 1.0 - 1e-6)
        backend = str(self.ENCODING_BACKEND)
        n_corners = int(self.STOCHASTIC_CORNERS)
        stochastic = encode_seed is not None and n_corners > 0
        if backend == 'cell':
            if self.NEEDS_POS_GRAD:
                raise ValueError(
                    'ENCODING_BACKEND=cell has no position-gradient '
                    'kernel; deformation methods must set '
                    "ENCODING_BACKEND='xbar'")
            # Exact 8-corner always: cell packing amortizes the per-corner
            # machinery, so the stochastic estimator (and its quality bill)
            # is unnecessary (encode_seed is accepted but unused).
            from nerficg_tpu.ops.hash_cell import hash_encode_cell
            feats_t = hash_encode_cell(params['hash_table'], unit,
                                       self.hash_config, anchor_keys)
            h = _mlp_featT(params['density_mlp'], feats_t)
            sigma = trunc_exp(h[..., 0])
            return sigma, h[..., 1:]
        if backend == 'window':
            if self.NEEDS_POS_GRAD:
                raise ValueError(
                    'ENCODING_BACKEND=window has no position-gradient '
                    'kernel yet; deformation methods must set '
                    "ENCODING_BACKEND='xbar'")
            from nerficg_tpu.ops.hash_window import (
                hash_encode_win, hash_encode_win_stochastic)
            if stochastic:
                feats_t = hash_encode_win_stochastic(
                    params['hash_table'], unit, encode_seed,
                    self.hash_config, n_corners, anchor_keys)
            else:
                feats_t = hash_encode_win(params['hash_table'], unit,
                                          self.hash_config, anchor_keys)
            h = _mlp_featT(params['density_mlp'], feats_t)
            sigma = trunc_exp(h[..., 0])
            return sigma, h[..., 1:]
        elif backend == 'xbar':
            if stochastic:
                enc = hash_encode_xbar_stochastic_posgrad \
                    if self.NEEDS_POS_GRAD else hash_encode_xbar_stochastic
                feats = enc(params['hash_table'], unit, encode_seed,
                            self.hash_config, n_corners)
            else:
                enc = hash_encode_xbar_posgrad if self.NEEDS_POS_GRAD \
                    else hash_encode_xbar
                feats = enc(params['hash_table'], unit, self.hash_config)
        else:
            raise ValueError(
                f'unknown ENCODING_BACKEND {self.ENCODING_BACKEND!r}')
        h = _mlp(params['density_mlp'], feats)
        sigma = trunc_exp(h[..., 0])
        return sigma, h[..., 1:]

    def color(self, params: dict, geo_features: jnp.ndarray,
              directions: jnp.ndarray) -> jnp.ndarray:
        """(N, GEO) features + (N, 3) unit dirs -> (N, 3) rgb."""
        sh = sh_encode(directions, int(self.SH_DEGREE))
        x = jnp.concatenate([sh, geo_features], axis=-1)
        return jax.nn.sigmoid(_mlp(params['color_mlp'], x))

    def field(self, params: dict, positions: jnp.ndarray,
              directions: jnp.ndarray,
              encode_seed: Optional[jnp.ndarray] = None,
              anchor_keys: Optional[jnp.ndarray] = None
              ) -> tuple[jnp.ndarray, jnp.ndarray]:
        sigma, geo = self.density(params, positions, encode_seed=encode_seed,
                                  anchor_keys=anchor_keys)
        rgb = self.color(params, geo, directions)
        return sigma, rgb

    def mlp_weight_squares(self, params: dict) -> jnp.ndarray:
        """Sum of squared MLP weights for the weight-decay loss term
        (reference: InstantNGP/Model.py:38-44, Loss.py:12-26)."""
        total = jnp.zeros(())
        count = 0
        for w in params['density_mlp'] + params['color_mlp']:
            total = total + jnp.sum(w.astype(jnp.float32) ** 2)
            count += w.size
        return total / max(count, 1)
