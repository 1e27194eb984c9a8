"""Shared setup + timing helpers for the tools/ TPU profiling harnesses.

One source of truth for the synthetic profiling scene (used by
profile_ingp.py, capacity_ab.py, trace_step.py) and for the chained-
dispatch timing methodology (PERF_NOTES.md): eager tiny ops through the
axon tunnel cost a ~27 ms synchronous round trip each, so timed work is
chained device-side — each call consumes the previous call's scalar
output so the queue never drains — with ONE host fetch at the end;
per-call cost = (total - FETCH_OVERHEAD_S) / iters.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

# Synchronous dispatch+fetch round trip through the axon tunnel, measured
# round 2 (PERF_NOTES.md); subtracted once per timing loop.
FETCH_OVERHEAD_S = 0.027


def timed(work, args, iters=30, label='', width=48):
    """Time `work(*args)` via chained jitted dispatches; returns ms/call."""
    @jax.jit
    def step(c, *a):
        out = work(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return c + leaf.ravel()[0].astype(jnp.float32) * 1e-20

    c = jnp.zeros(())
    c = step(c, *args)
    jax.block_until_ready(c)
    start = time.perf_counter()
    for _ in range(iters):
        c = step(c, *args)
    float(c)
    per = (time.perf_counter() - start - FETCH_OVERHEAD_S) / iters * 1000.0
    if label:
        print(f'{label:{width}s} {per:8.3f} ms')
    return per


def make_synthetic_trainer(model_overrides=None, renderer_overrides=None,
                           n_rays=8192, batch=262144):
    """Build an InstantNGP trainer + synthetic profiling inputs.

    Returns a dict with trainer/model/renderer, a shell occupancy grid
    (binary), and `n_rays` camera-ring rays aimed at jittered targets
    inside the shell (matches the training distribution the marcher sees).
    """
    from nerficg_tpu.core.config import ConfigNode
    from nerficg_tpu.core.logging import Logger
    from nerficg_tpu.core.registry import Methods
    Logger.set_level('SILENT')

    # Pinned to the throughput operating point (64^3 march, matching
    # bench.py's headline) so profiler numbers stay comparable across
    # library-default changes; overrides replace any of it.
    config = ConfigNode({
        'GLOBAL': {'METHOD_TYPE': 'InstantNGP', 'RANDOM_SEED': 0},
        'MODEL': dict(model_overrides or {}),
        'RENDERER': {'MAX_SAMPLES': 512, 'AVG_SAMPLES_PER_RAY': 32,
                     'MARCH_RESOLUTION': 64,
                     **(renderer_overrides or {})},
        'TRAINING': {'INITIAL_RAYS_PER_BATCH': int(n_rays),
                     'TARGET_BATCH_SIZE': int(batch),
                     'RANDOM_BACKGROUND': True},
    })
    trainer = Methods.get_training_instance(config)
    model = trainer.model
    renderer = trainer.renderer

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    angles = jax.random.uniform(k1, (n_rays,), maxval=2 * np.pi)
    origins = jnp.stack([1.2 * jnp.cos(angles),
                         jax.random.uniform(k4, (n_rays,), minval=-0.3,
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

    return {'trainer': trainer, 'model': model, 'renderer': renderer,
            'grid': grid, 'origins': origins, 'directions': directions,
            'target_rgb': target_rgb, 'n_rays': n_rays}


def make_full_step(env):
    """Wire the trainer's jitted train step over the synthetic inputs.

    Returns (full_step, params0, opt_state0); full_step(params, opt_state)
    -> (params, opt_state), suitable for chained stepping (the step donates
    its params/opt_state buffers, so params0 is a copy)."""
    trainer = env['trainer']
    n_rays = env['n_rays']
    trainer._pool = {'origins': env['origins'],
                     'directions': env['directions'],
                     'rgb': env['target_rgb'], 'alpha': None}
    trainer._pool_size = n_rays
    step = trainer._get_train_step(n_rays)
    opt_state = trainer.optimizer.init(env['model'].params)
    ids = jnp.arange(n_rays, dtype=jnp.int32)
    grid = env['grid']
    pool = trainer._pool
    bg = jnp.zeros(3)

    def full_step(params, opt_state):
        p, o, logs = step(params, opt_state, grid, pool, ids,
                          jax.random.PRNGKey(1), bg)
        return p, o

    p0 = jax.tree_util.tree_map(jnp.copy, env['model'].params)
    return full_step, p0, opt_state


def time_full_step(env, iters=30):
    """ms per full train step, chained, overhead-corrected."""
    full_step, p, o = make_full_step(env)
    p, o = full_step(p, o)
    jax.block_until_ready(p)
    start = time.perf_counter()
    for _ in range(iters):
        p, o = full_step(p, o)
    jax.block_until_ready(p)
    return (time.perf_counter() - start - FETCH_OVERHEAD_S) / iters * 1000.0
