#!/usr/bin/env python3
"""Capacity A/B: throughput + quality of the gen-3 windowed encode as the
per-level hash table grows 2^14 -> 2^19 (the reference tcnn operating point,
/root/reference/src/Methods/InstantNGP/Model.py:64 log2_hashmap_size=19).

Two measurements per capacity K:
  1. train-step wall time at the 262144-samples/step operating point (the
     claim under test: the windowed encode's scan cost follows scene
     locality, NOT table extent — VERDICT round 2, missing #1);
  2. end-to-end PSNR on the procedural quality probe (bench.py --quality
     path), which anchors that bigger tables at least do not regress.

Run on the TPU chip: `python tools/capacity_ab.py [--ks 14,16,18]
[--iters 3000] [--image-size 128]`.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update('jax_compilation_cache_dir', str(Path.home() / '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)

import jax.numpy as jnp
import numpy as np


def measure_throughput(log2_size: int) -> float:
    """ms per full train step (8192 rays / 262k samples) at capacity 2^K."""
    from nerficg_tpu.core.config import ConfigNode
    from nerficg_tpu.core.logging import Logger
    from nerficg_tpu.core.registry import Methods
    Logger.set_level('SILENT')

    config = ConfigNode({
        'GLOBAL': {'METHOD_TYPE': 'InstantNGP', 'RANDOM_SEED': 0},
        'MODEL': {'LOG2_HASHMAP_SIZE': int(log2_size)},
        'RENDERER': {'MAX_SAMPLES': 512, 'AVG_SAMPLES_PER_RAY': 32},
        'TRAINING': {'INITIAL_RAYS_PER_BATCH': 8192,
                     'TARGET_BATCH_SIZE': 262144,
                     'RANDOM_BACKGROUND': True},
    })
    trainer = Methods.get_training_instance(config)
    model = trainer.model
    renderer = trainer.renderer

    rng = jax.random.PRNGKey(0)
    n_rays = 8192
    k1, k2, k3 = jax.random.split(rng, 3)
    angles = jax.random.uniform(k1, (n_rays,), maxval=2 * np.pi)
    origins = jnp.stack([1.2 * jnp.cos(angles),
                         jax.random.uniform(k1, (n_rays,), minval=-0.3,
                                            maxval=0.3),
                         1.2 * jnp.sin(angles)], axis=-1)
    targets = jax.random.uniform(k2, (n_rays, 3), minval=-0.4, maxval=0.4)
    directions = targets - origins
    directions = directions / jnp.linalg.norm(directions, axis=-1,
                                              keepdims=True)
    target_rgb = jax.random.uniform(k3, (n_rays, 3))

    res = int(model.GRID_RESOLUTION)
    ax = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res - 0.5
    r2 = (ax[:, None, None] ** 2 + ax[None, :, None] ** 2 +
          ax[None, None, :] ** 2)
    shell = (r2 > 0.29 ** 2) & (r2 < 0.31 ** 2)
    model.buffers['density_grid'] = shell.reshape(-1).astype(jnp.float32) * \
        4.0 * renderer.density_threshold
    grid = renderer.grid_binary()

    trainer._pool = {'origins': origins, 'directions': directions,
                     'rgb': target_rgb, 'alpha': None}
    trainer._pool_size = n_rays
    step = trainer._get_train_step(n_rays)
    opt_state = trainer.optimizer.init(model.params)
    ids = jnp.arange(n_rays, dtype=jnp.int32)

    def full_step(params, opt_state):
        p, o, logs = step(params, opt_state, grid, trainer._pool, ids,
                          jax.random.PRNGKey(1), jnp.zeros(3))
        return p, o

    p0 = jax.tree_util.tree_map(jnp.copy, model.params)
    p, o = full_step(p0, opt_state)
    jax.block_until_ready(p)
    iters = 30
    start = time.perf_counter()
    for _ in range(iters):
        p, o = full_step(p, o)
    jax.block_until_ready(p)
    return (time.perf_counter() - start) / iters * 1000.0


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--ks', default='14,16,18')
    parser.add_argument('--iters', type=int, default=3000)
    parser.add_argument('--image-size', type=int, default=128)
    parser.add_argument('--skip-quality', action='store_true')
    args = parser.parse_args()
    ks = [int(k) for k in args.ks.split(',')]

    rows = []
    for k in ks:
        ms = measure_throughput(k)
        rows.append({'log2_size': k, 'step_ms': round(ms, 3),
                     'rays_per_s': round(8192 / (ms / 1000.0))})
        print(json.dumps(rows[-1]), flush=True)

    if not args.skip_quality:
        import subprocess
        for k in ks:
            out = subprocess.run(
                [sys.executable, str(Path(__file__).parents[1] / 'bench.py'),
                 '--quality', '--iters', str(args.iters),
                 '--image-size', str(args.image_size),
                 '--model', f'LOG2_HASHMAP_SIZE={k}'],
                capture_output=True, text=True)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith('{')]
            print(f'K={k}: {line[-1] if line else out.stderr[-400:]}',
                  flush=True)


if __name__ == '__main__':
    main()
