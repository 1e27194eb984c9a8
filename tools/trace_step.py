"""Capture a jax.profiler trace of the Instant-NGP train step and print the
top device ops by self time (parsed with tensorboard_plugin_profile, no
TensorBoard needed). Usage:

    python tools/trace_step.py [--which step|render] [--top 40]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(which: str):
    from nerficg_tpu.core.config import ConfigNode
    from nerficg_tpu.core.logging import Logger
    from nerficg_tpu.core.registry import Methods
    Logger.set_level('SILENT')
    config = ConfigNode({
        'GLOBAL': {'METHOD_TYPE': 'InstantNGP', 'RANDOM_SEED': 0},
        'MODEL': {},
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

    if which == 'render':
        def run_grad(p, o, d, r):
            def loss(pp):
                out = renderer._render_rays_impl(
                    pp, grid, o, d, r, jnp.zeros(3), randomized=True,
                    num_rays=n_rays, samples_per_ray=32)
                return jnp.sum(out['rgb'] ** 2)
            return jax.grad(loss)(p)['hash_table']
        fn = jax.jit(run_grad)
        args = (model.params, origins, directions, jax.random.PRNGKey(1))

        def call():
            return fn(*args)
        return call

    trainer._pool = {'origins': origins, 'directions': directions,
                     'rgb': target_rgb, 'alpha': None}
    trainer._pool_size = n_rays
    step = trainer._get_train_step(n_rays)
    opt_state = trainer.optimizer.init(model.params)
    ids = jnp.arange(n_rays, dtype=jnp.int32)
    bg = jnp.zeros(3)
    p0 = jax.tree_util.tree_map(jnp.copy, model.params)
    state = [p0, opt_state]

    def call():
        p, o, _ = step(state[0], state[1], grid, trainer._pool, ids,
                       jax.random.PRNGKey(1), bg)
        state[0], state[1] = p, o
        return p
    return call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--which', default='step')
    ap.add_argument('--top', type=int, default=40)
    args = ap.parse_args()

    call = build(args.which)
    jax.block_until_ready(call())   # compile
    jax.block_until_ready(call())

    tmp = tempfile.mkdtemp(prefix='ingp_trace_')
    with jax.profiler.trace(tmp):
        for _ in range(10):
            out = call()
        jax.block_until_ready(out)

    xplanes = glob.glob(os.path.join(tmp, '**', '*.xplane.pb'),
                        recursive=True)
    if not xplanes:
        print('no xplane captured under', tmp)
        return
    # Parse the XSpace proto directly (the tensorboard profile plugin's
    # pywrap helper mismatches this TF build). Aggregate leaf XEvent
    # durations on the TPU op plane.
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xspace = xplane_pb2.XSpace()
    with open(xplanes[0], 'rb') as f:
        xspace.ParseFromString(f.read())
    agg = {}
    for plane in xspace.planes:
        if 'TPU' not in plane.name and 'Device' not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            lname = line.name.lower()
            if 'step' in lname and 'xla' not in lname:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e6   # -> us
                t, c = agg.get((line.name, name), (0.0, 0))
                agg[(line.name, name)] = (t + dur, c + 1)
    ops = sorted(((t, c, ln, n) for (ln, n), (t, c) in agg.items()
                  if ln == 'XLA Ops'), reverse=True)
    by_line = {}
    for (ln, n), (t, c) in agg.items():
        by_line[ln] = by_line.get(ln, 0.0) + t
    for ln, t in sorted(by_line.items(), key=lambda kv: -kv[1]):
        print(f'line {ln!r}: {t/10000:.3f} ms/step')
    print()
    for t, c, ln, name in ops[:args.top]:
        print(f'{t/10000:9.4f} ms  x{c:4d}  {name[:130]}')


if __name__ == '__main__':
    main()
