#!/usr/bin/env python3
"""Headline benchmark: training throughput in rays/s on the current device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.json north star = 1e7 rays/s (InstantNGP-class training on
one TPU v5p chip). Round 1 measures the vanilla-NeRF train step (full-size
8x256 model, hierarchical 64+128 samples); later rounds switch this to the
hash-grid InstantNGP step.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_SEC = 1.0e7


def main() -> None:
    from nerficg_tpu.core.config import ConfigNode
    from nerficg_tpu.core.logging import Logger
    from nerficg_tpu.core.registry import Methods

    Logger.set_level('SILENT')

    config = ConfigNode({
        'GLOBAL': {'METHOD_TYPE': 'NeRF', 'RANDOM_SEED': 0},
        'MODEL': {'NUM_LAYERS': 8, 'WIDTH': 256, 'SKIP_LAYER': 5,
                  'USE_COARSE': True},
        'RENDERER': {'RAY_BATCH_SIZE': 2048, 'N_SAMPLES': 192,
                     'COARSE_RATIO': 1.0 / 3.0},
        'TRAINING': {'NUM_ITERATIONS': 1000, 'RAYS_PER_BATCH': 2048},
    })
    trainer = Methods.get_training_instance(config)

    num_rays = int(config.TRAINING.RAYS_PER_BATCH)
    rng = jax.random.PRNGKey(0)
    pool_size = 1 << 18
    k1, k2, k3 = jax.random.split(rng, 3)
    origins = jax.random.normal(k1, (pool_size, 3)) * 0.1 + \
        jnp.array([0.0, 0.0, -4.0])
    directions = jax.random.normal(k2, (pool_size, 3))
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    trainer._pool = {
        'origins': origins,
        'directions': directions,
        'rgb': jax.random.uniform(k3, (pool_size, 3)),
        'alpha': None,
    }
    trainer._pool_size = pool_size
    trainer._np_rng = np.random.default_rng(0)
    trainer._near = jnp.asarray(2.0)
    trainer._far = jnp.asarray(6.0)
    trainer._bg = jnp.zeros(3)
    trainer.opt_state = trainer.optimizer.init(trainer.model.params)
    trainer._build_train_step()

    # Warmup / compile.
    for i in range(3):
        trainer.training_iteration(None, i)
    jax.block_until_ready(trainer.model.params)

    steps = 30
    start = time.perf_counter()
    for i in range(steps):
        trainer.training_iteration(None, i + 3)
    jax.block_until_ready(trainer.model.params)
    elapsed = time.perf_counter() - start

    rays_per_sec = steps * num_rays / elapsed
    print(json.dumps({
        'metric': 'nerf_train_throughput',
        'value': round(rays_per_sec, 1),
        'unit': 'rays/s',
        'vs_baseline': round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
    }))


if __name__ == '__main__':
    main()
