"""Learning-rate schedules.

Reference equivalent: ``LRDecayPolicy`` (src/Optim/lr_utils.py:9-33) —
log-linear interpolation init->final with optional cosine-delayed warmup
(svox2-style), plus the MultiStepLR used by InstantNGP
(src/Methods/InstantNGP/Trainer.py:39-43). Expressed as optax-compatible
schedule functions (step -> multiplier/lr).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ['lr_decay_policy', 'multistep_lr', 'exponential_decay']


def lr_decay_policy(lr_init: float, lr_final: float, max_steps: int,
                    lr_delay_steps: int = 0, lr_delay_mult: float = 1.0):
    """Log-lerp init->final with optional cosine-delay warmup
    (reference: Optim/lr_utils.py:9-33). Returns an optax schedule fn."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        t = jnp.clip(step / max(max_steps, 1), 0.0, 1.0)
        log_lerp = jnp.exp((1.0 - t) * jnp.log(lr_init) + t * jnp.log(lr_final))
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
        else:
            delay = 1.0
        return delay * log_lerp

    return schedule


def multistep_lr(lr_init: float, milestones: list[int], gamma: float = 0.33):
    """Step decay at milestones (reference: InstantNGP/Trainer.py:39-43)."""
    milestones = sorted(milestones)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        factor = jnp.ones(())
        for m in milestones:
            factor = factor * jnp.where(step >= m, gamma, 1.0)
        return lr_init * factor

    return schedule


def exponential_decay(lr_init: float, lr_final: float, max_steps: int):
    def schedule(step):
        t = jnp.clip(jnp.asarray(step, jnp.float32) / max(max_steps, 1), 0.0, 1.0)
        return lr_init * (lr_final / lr_init) ** t

    return schedule
