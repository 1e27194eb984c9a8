#!/usr/bin/env python3
"""INGP train-step component profiler (run on the TPU chip).

Methodology (PERF_NOTES.md): chained dispatches — each call consumes the
previous call's scalar output so the queue never drains — with ONE host
fetch at the end; per-call cost = (total - fetch_overhead) / iters.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', str(Path.home() / '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)


def timed(work, args, iters=30, label=''):
    """Chained dispatches with the chain INSIDE jit (eager tiny ops cost a
    ~27 ms synchronous round trip each through the axon tunnel)."""
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
    per = (time.perf_counter() - start - 0.027) / iters * 1000.0
    print(f'{label:42s} {per:8.3f} ms')
    return per


def main():
    import ast

    parser = argparse.ArgumentParser()
    parser.add_argument('--which', default='all')
    parser.add_argument('--set', action='append', default=[],
                        help='config override SECTION.KEY=VALUE, e.g. '
                             'RENDERER.MARCH_RESOLUTION=128')
    args = parser.parse_args()

    from nerficg_tpu.core.config import ConfigNode
    from nerficg_tpu.core.logging import Logger
    from nerficg_tpu.core.registry import Methods
    Logger.set_level('SILENT')

    # Pinned to the throughput operating point (matches bench.py's
    # headline) so profiles stay comparable across default changes;
    # --set overrides any of it.
    raw = {
        'GLOBAL': {'METHOD_TYPE': 'InstantNGP', 'RANDOM_SEED': 0},
        'MODEL': {'ENCODING_BACKEND': 'cell', 'LOG2_HASHMAP_SIZE': 14},
        'RENDERER': {'MAX_SAMPLES': 512, 'AVG_SAMPLES_PER_RAY': 32,
                     'MARCH_RESOLUTION': 64},
        'TRAINING': {'INITIAL_RAYS_PER_BATCH': 8192,
                     'TARGET_BATCH_SIZE': 262144,
                     'RANDOM_BACKGROUND': True},
    }
    for kv in args.set:
        dotted, _, val = kv.partition('=')
        section, _, key = dotted.partition('.')
        try:
            raw[section][key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            raw[section][key] = val
    config = ConfigNode(raw)
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

    n_samples = 262144
    positions = jax.random.uniform(jax.random.PRNGKey(5), (n_samples, 3),
                                   minval=0.0, maxval=1.0 - 1e-6)
    table = model.params['hash_table']
    cfg = model.hash_config
    seed = jnp.asarray([[123]], jnp.int32)
    gcot = jax.random.normal(jax.random.PRNGKey(6),
                             (n_samples, cfg.output_dim))

    from nerficg_tpu.ops.hash_xbar import (hash_encode_xbar,
                                           hash_encode_xbar_stochastic)
    from nerficg_tpu.ops.occupancy import march_rays

    which = args.which

    if which in ('all', 'step'):
        # full train step via the trainer's own jitted fn
        trainer._pool = {'origins': origins, 'directions': directions,
                         'rgb': target_rgb, 'alpha': None}
        trainer._pool_size = n_rays
        step = trainer._get_train_step(n_rays)
        opt_state = trainer.optimizer.init(model.params)
        ids = jnp.arange(n_rays, dtype=jnp.int32)
        bg = jnp.zeros(3)

        def full_step(params, opt_state):
            p, o, logs = step(params, opt_state, grid, trainer._pool, ids,
                              jax.random.PRNGKey(1), bg)
            return p, o
        # the step donates its params/opt_state buffers; keep the model's
        # own params alive for the later profile sections
        p0 = jax.tree_util.tree_map(jnp.copy, model.params)
        p, o = full_step(p0, opt_state)
        jax.block_until_ready(p)
        # chained: reuse output params as next input
        start = time.perf_counter()
        iters = 30
        for _ in range(iters):
            p, o = full_step(p, o)
        jax.block_until_ready(p)
        total = time.perf_counter() - start
        print(f'{"full train step (8192 rays/262k samples)":42s} '
              f'{total / iters * 1000.0:8.3f} ms')

    if which in ('all', 'parts'):
        # stage-by-stage of the WINDOWED train step at the operating point
        def march_only(o, d, r):
            return march_rays(
                o, d, model.aabb_min, model.aabb_max, grid,
                renderer._march_res, max_steps=512, sample_budget=262144,
                rng=r, block=8, exponential=False).positions

        timed(march_only, (origins, directions, jax.random.PRNGKey(1)),
              label='march (ray order only)')

        def march_m(o, d, r):
            return march_rays(
                o, d, model.aabb_min, model.aabb_max, grid,
                renderer._march_res, max_steps=512, sample_budget=262144,
                rng=r, block=8, exponential=False, morton=True).positions_m

        timed(march_m, (origins, directions, jax.random.PRNGKey(1)),
              label='march (+morton view)')

        def render_fwd(p, o, d, r):
            out = renderer._render_rays_impl(
                p, grid, o, d, r, jnp.zeros(3), randomized=True,
                num_rays=n_rays, samples_per_ray=32)
            return out['rgb']

        timed(render_fwd, (model.params, origins, directions,
                           jax.random.PRNGKey(1)),
              label='render fwd (march+field+composite)')

        def render_grad(p, o, d, r):
            def loss(pp):
                out = renderer._render_rays_impl(
                    pp, grid, o, d, r, jnp.zeros(3), randomized=True,
                    num_rays=n_rays, samples_per_ray=32)
                return jnp.sum(out['rgb'] ** 2)
            return jax.grad(loss)(p)['hash_table']

        timed(render_grad, (model.params, origins, directions,
                            jax.random.PRNGKey(1)),
              label='render fwd+bwd (no adam)')

        from nerficg_tpu.ops.sample_sort import permute_block_channels
        ch = jax.random.normal(jax.random.PRNGKey(3), (4, 262144))
        perm = jax.random.permutation(jax.random.PRNGKey(4), 32768)
        inv = jnp.argsort(perm)

        def perm_fn(c):
            return permute_block_channels(c, 8, perm, inv)

        timed(perm_fn, (ch,), label='permute 4ch')

        # march internals: candidate mask stage vs compaction vs expansion
        from nerficg_tpu.ops.occupancy import _ray_aabb
        from nerficg_tpu.ops.xbar_gather import occupancy_probe

        def mask_stage(o, d, r):
            t_near, t_far = _ray_aabb(o, d, model.aabb_min, model.aabb_max,
                                      0.05)
            rate = (t_far - t_near) / 512
            step_idx = jnp.arange(512, dtype=jnp.float32)
            ts = t_near[:, None] + (step_idx[None, :] + 0.5) * rate[:, None]
            pos = o[:, None, :] + d[:, None, :] * ts[..., None]
            unit = (pos - model.aabb_min) / (model.aabb_max - model.aabb_min)
            in_box = jnp.all((unit >= 0.0) & (unit < 1.0), axis=-1)
            occ = occupancy_probe(grid, unit, renderer._march_res)
            m = occ & in_box
            return m.reshape(n_rays, 64, 8).any(axis=2)

        timed(mask_stage, (origins, directions, jax.random.PRNGKey(1)),
              label='march: candidate mask (4.2M probes)')

        flags = mask_stage(origins, directions, jax.random.PRNGKey(1))

        def nonzero_stage(f):
            (sel,) = jnp.nonzero(f.reshape(-1), size=32768,
                                 fill_value=f.size)
            return sel

        timed(nonzero_stage, (flags,), label='march: nonzero compaction')

    if which in ('all', 'march'):
        march_j = jax.jit(lambda o, d, r: march_rays(
            o, d, model.aabb_min, model.aabb_max, grid,
            renderer._march_res, max_steps=512, sample_budget=262144,
            rng=r, block=8, exponential=False))
        timed(march_j, (origins, directions, jax.random.PRNGKey(1)),
              label='march_rays (8192 rays, 512 steps)')

    if which in ('all', 'encode'):
        enc2 = jax.jit(lambda t, p: hash_encode_xbar_stochastic(
            t, p, seed, cfg, 2))
        timed(enc2, (table, positions), label='encode fwd stoch-2 (262k)')
        ence = jax.jit(lambda t, p: hash_encode_xbar(t, p, cfg))
        timed(ence, (table, positions), label='encode fwd exact-8 (262k)')

        enc2g = jax.jit(jax.grad(lambda t, p: jnp.sum(
            hash_encode_xbar_stochastic(t, p, seed, cfg, 2) * gcot)))
        timed(enc2g, (table, positions), label='encode fwd+bwd stoch-2 (262k)')
        enceg = jax.jit(jax.grad(lambda t, p: jnp.sum(
            hash_encode_xbar(t, p, cfg) * gcot)))
        timed(enceg, (table, positions), label='encode fwd+bwd exact-8 (262k)')

    if which in ('all', 'winencode'):
        from nerficg_tpu.ops.hash_window import (hash_encode_win,
                                                 hash_encode_win_stochastic,
                                                 morton_sort_keys)
        keys = morton_sort_keys(positions)
        order = jnp.argsort(keys)
        pos_sorted = positions[order]

        wenc2 = jax.jit(lambda t, p: hash_encode_win_stochastic(
            t, p, seed, cfg, 2))
        timed(wenc2, (table, pos_sorted), label='win-encode fwd stoch-2 (262k)')
        wence = jax.jit(lambda t, p: hash_encode_win(t, p, cfg))
        timed(wence, (table, pos_sorted), label='win-encode fwd exact-8 (262k)')

        gcot_t = gcot.T   # windowed encode is feature-major (F, N)
        wenc2g = jax.jit(jax.grad(lambda t, p: jnp.sum(
            hash_encode_win_stochastic(t, p, seed, cfg, 2) * gcot_t)))
        timed(wenc2g, (table, pos_sorted),
              label='win-encode fwd+bwd stoch-2 (262k)')
        wenceg = jax.jit(jax.grad(lambda t, p: jnp.sum(
            hash_encode_win(t, p, cfg) * gcot_t)))
        timed(wenceg, (table, pos_sorted),
              label='win-encode fwd+bwd exact-8 (262k)')

        # through the real marcher stream (anchor-keyed windows)
        def march_enc2(t, o, d, r):
            m = march_rays(o, d, model.aabb_min, model.aabb_max, grid,
                           renderer._march_res, max_steps=512,
                           sample_budget=262144, rng=r, block=8,
                           exponential=False, morton=True)
            unit = (m.positions_m - model.aabb_min) / \
                (model.aabb_max - model.aabb_min)
            return hash_encode_win_stochastic(
                t, jnp.clip(unit, 0.0, 1.0 - 1e-6), seed, cfg, 2,
                anchor_keys=m.block_keys_m)
        timed(march_enc2, (table, origins, directions, jax.random.PRNGKey(1)),
              label='march + win-encode fwd stoch-2')

        def march_enc2g(t, o, d, r):
            def loss(tt):
                return jnp.sum(march_enc2(tt, o, d, r) * gcot.T)
            return jax.grad(loss)(t)
        timed(march_enc2g, (table, origins, directions,
                            jax.random.PRNGKey(1)),
              label='march + win-encode fwd+bwd stoch-2')

    if which in ('all', 'bwdgap'):
        # Bisect the render backward: where do the ~3 ms beyond the isolated
        # kernel backwards (encode 0.4 + mlp 0.25 + composite 0.25 + permute
        # 0.35) go?
        from nerficg_tpu.ops.sample_sort import permute_block_channels

        def march_once(o, d, r):
            return march_rays(
                o, d, model.aabb_min, model.aabb_max, grid,
                renderer._march_res, max_steps=512, sample_budget=262144,
                rng=r, block=8, exponential=False, morton=True)

        seed_arr = jnp.asarray([[7]], jnp.int32)

        def field_ctx(p, o, d, r):
            m = march_once(o, d, r)
            def loss(pp):
                sigma, rgb = model.field(pp, m.positions_m, m.directions_m,
                                         encode_seed=seed_arr,
                                         anchor_keys=m.block_keys_m)
                return jnp.sum(sigma) + jnp.sum(rgb)
            return jax.grad(loss)(p)['hash_table']
        timed(field_ctx, (model.params, origins, directions,
                          jax.random.PRNGKey(1)),
              label='march+field fwd+bwd (in ctx)')

        def field_perm_ctx(p, o, d, r):
            m = march_once(o, d, r)
            def loss(pp):
                sigma, rgb = model.field(pp, m.positions_m, m.directions_m,
                                         encode_seed=seed_arr,
                                         anchor_keys=m.block_keys_m)
                ch = permute_block_channels(
                    jnp.stack([sigma, rgb[:, 0], rgb[:, 1], rgb[:, 2]]),
                    8, m.perm_to_ray, m.perm_to_morton)
                return jnp.sum(ch)
            return jax.grad(loss)(p)['hash_table']
        timed(field_perm_ctx, (model.params, origins, directions,
                               jax.random.PRNGKey(1)),
              label='march+field+permute fwd+bwd')

        def field_perm_mask_ctx(p, o, d, r):
            m = march_once(o, d, r)
            def loss(pp):
                sigma, rgb = model.field(pp, m.positions_m, m.directions_m,
                                         encode_seed=seed_arr,
                                         anchor_keys=m.block_keys_m)
                ch = permute_block_channels(
                    jnp.stack([sigma, rgb[:, 0], rgb[:, 1], rgb[:, 2]]),
                    8, m.perm_to_ray, m.perm_to_morton)
                s = jnp.where(m.valid, ch[0], 0.0)
                from nerficg_tpu.ops.occupancy import composite_packed
                out = composite_packed(s, ch[1:4], m, n_rays,
                                       background=jnp.zeros(3), block=8)
                return jnp.sum(out['rgb'] ** 2)
            return jax.grad(loss)(p)['hash_table']
        timed(field_perm_mask_ctx, (model.params, origins, directions,
                                    jax.random.PRNGKey(1)),
              label='march+field+perm+composite bwd')

        def render_exact(p, o, d, r):
            def loss(pp):
                out = renderer._render_rays_impl(
                    pp, grid, o, d, r, jnp.zeros(3), randomized=False,
                    num_rays=n_rays, samples_per_ray=32)
                return jnp.sum(out['rgb'] ** 2)
            return jax.grad(loss)(p)['hash_table']
        timed(render_exact, (model.params, origins, directions,
                             jax.random.PRNGKey(1)),
              label='render fwd+bwd EXACT encode')

    if which in ('all', 'mlp'):
        dirs_s = jnp.broadcast_to(directions[:1], (n_samples, 3))

        def field_loss(params, pos):
            sigma, rgb = model.field(params, pos, dirs_s, encode_seed=None)
            return jnp.sum(sigma) + jnp.sum(rgb)
        fl = jax.jit(jax.grad(field_loss))
        timed(fl, (model.params, positions),
              label='field fwd+bwd exact (262k, incl encode)')

        def mlponly(params, feats):
            from nerficg_tpu.methods.instant_ngp.model import _mlp, trunc_exp
            h = _mlp(params['density_mlp'], feats)
            sigma = trunc_exp(h[..., 0])
            rgb = model.color(params, h[..., 1:], dirs_s)
            return jnp.sum(sigma) + jnp.sum(rgb)
        feats = jnp.zeros((n_samples, cfg.output_dim))
        ml = jax.jit(jax.grad(mlponly, argnums=(0, 1)))
        timed(ml, (model.params, feats), label='MLPs fwd+bwd (262k)')

    if which in ('all', 'sort'):
        # cost out the sorted-stream design primitives
        keys = jax.random.randint(jax.random.PRNGKey(7), (n_samples,),
                                  0, 1 << 30, jnp.int32)
        pay = jax.random.normal(jax.random.PRNGKey(8), (6, n_samples))

        def sort6(k, p):
            ops = jax.lax.sort((k,) + tuple(p), num_keys=1)
            return ops[0], jnp.stack(ops[1:])
        s6 = jax.jit(sort6)
        timed(s6, (keys, pay), label='lax.sort 262k key + 6 payloads')

        def sort2(k, p):
            ops = jax.lax.sort((k, p[0], p[1]), num_keys=1)
            return ops[0], ops[1]
        s2 = jax.jit(sort2)
        timed(s2, (keys, pay), label='lax.sort 262k key + 2 payloads')

        pay16 = jax.random.normal(jax.random.PRNGKey(8), (16, n_samples))

        def sort16(k, p):
            ops = jax.lax.sort((k,) + tuple(p), num_keys=1)
            return ops[0], jnp.stack(ops[1:])
        s16 = jax.jit(sort16)
        timed(s16, (keys, pay16), label='lax.sort 262k key + 16 payloads')

        # argsort then gather rows (32 channels) — the "unsort" candidate
        def argsort_gather(k, p):
            order = jnp.argsort(k)
            return p[:, order]
        ag = jax.jit(argsort_gather)
        timed(ag, (keys, pay16), label='argsort + take 16ch (262k)')

    if which in ('all', 'glue'):
        # composite on a fake march result
        from nerficg_tpu.ops.occupancy import composite_packed
        march_j = jax.jit(lambda o, d, r: march_rays(
            o, d, model.aabb_min, model.aabb_max, grid,
            renderer._march_res, max_steps=512, sample_budget=262144,
            rng=r, block=8, exponential=False))
        march = march_j(origins, directions, jax.random.PRNGKey(1))
        sigma = jax.random.uniform(jax.random.PRNGKey(9), (262144,))
        rgbs = jax.random.uniform(jax.random.PRNGKey(10), (262144, 3))

        def comp(s, c):
            out = composite_packed(s, c, march, n_rays,
                                   background=jnp.zeros(3))
            return out['rgb']
        cj = jax.jit(jax.grad(lambda s, c: jnp.sum(comp(s, c)),
                              argnums=(0, 1)))
        timed(cj, (sigma, rgbs), label='composite fwd+bwd (262k)')


if __name__ == '__main__':
    main()
