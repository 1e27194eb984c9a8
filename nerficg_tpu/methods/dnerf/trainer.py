"""D-NeRF trainer: the Instant-NGP schedule over timestamped ray pools,
with a dedicated deformation-field optimizer group and an offset prior.

Reference context: the reference framework hosts dynamic methods as
sibling-repo plugins on the same Trainer contract (SURVEY §2.6); D-NeRF
(Pumarola et al.) trains the deformation MLP at a lower, exponentially
decaying learning rate than the canonical field, and keeps deformations
small where unobserved.  Here:

- The deformation group gets its own Adam with an exponential-decay
  schedule DEFORM_LR -> DEFORM_LR * DEFORM_LR_FINAL_FACTOR over the run
  (the hash table + field MLPs keep the Instant-NGP multistep schedule).
- An offset prior (mean squared deformation over random (position, time)
  pairs in the scene box) regularizes the warp toward identity in free
  space — the cheap TPU-shaped stand-in for Nerfies' elastic energy: it
  suppresses floaters dragged in by unconstrained deformations without a
  per-sample Jacobian (which would triple the encode cost).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from nerficg_tpu.core.config import Configurable
from nerficg_tpu.methods.instant_ngp.trainer import InstantNGPTrainer
from nerficg_tpu.optim.lr import multistep_lr

__all__ = ['DNeRFTrainer']


@Configurable.configure(
    NUM_ITERATIONS=30000,
    DEFORM_LR=1e-3,
    DEFORM_LR_FINAL_FACTOR=0.1,
    # Offset prior: weight * E[|deform(x, t) - x|^2] over uniform samples of
    # the scene box and the time range. 0 disables.
    OFFSET_REG_WEIGHT=1e-2,
    OFFSET_REG_POINTS=4096,
)
class DNeRFTrainer(InstantNGPTrainer):

    def __init__(self, config, model, renderer):
        super().__init__(config, model, renderer)
        base_schedule = multistep_lr(float(self.LR),
                                     list(self.LR_MILESTONES),
                                     float(self.LR_GAMMA))
        deform_schedule = optax.exponential_decay(
            float(self.DEFORM_LR),
            transition_steps=max(int(self.NUM_ITERATIONS), 1),
            decay_rate=float(self.DEFORM_LR_FINAL_FACTOR))

        def labels(params):
            return {
                key: jax.tree_util.tree_map(
                    lambda _: 'deform' if key == 'deform_mlp' else 'base',
                    value)
                for key, value in params.items()
            }

        self.optimizer = optax.multi_transform(
            {'base': optax.adam(learning_rate=base_schedule, eps=1e-15),
             'deform': optax.adam(learning_rate=deform_schedule, eps=1e-15)},
            labels)
        self.opt_state = None

    def _loss_extras(self, params, rng):
        n = int(self.OFFSET_REG_POINTS)
        weight = float(self.OFFSET_REG_WEIGHT)
        if n <= 0 or weight <= 0.0:
            return jnp.zeros(()), {}
        kp, kt = jax.random.split(jax.random.fold_in(rng, 0x0FF5E7))
        model = self.model
        pos = jax.random.uniform(kp, (n, 3), jnp.float32,
                                 minval=model.aabb_min,
                                 maxval=model.aabb_max)
        t = jax.random.uniform(kt, (n,), jnp.float32)
        offset = model.deform(params, pos, t) - pos
        reg = jnp.mean(jnp.sum(offset ** 2, axis=-1))
        return weight * reg, {'offset_reg': reg}
