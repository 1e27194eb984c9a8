#!/usr/bin/env python3
"""3DGS inference-path profiler (run on the TPU chip).

Breaks the 1080p/100k `render_image` cost into stages: projection+SH,
duplication, payload sort, histogram/starts, fused composite, assembly.
Methodology as tools/profile_ingp.py (chained dispatches inside jit).
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
    print(f'{label:46s} {per:8.3f} ms')
    return per


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--num', type=int, default=100_000)
    parser.add_argument('--width', type=int, default=1920)
    parser.add_argument('--height', type=int, default=1080)
    parser.add_argument('--which', default='infer',
                        choices=('infer', 'train', 'all'))
    args = parser.parse_args()

    from nerficg_tpu.core.config import ConfigNode
    from nerficg_tpu.core.logging import Logger
    from nerficg_tpu.core.registry import Methods
    from nerficg_tpu.data.types import BasicPointCloud
    Logger.set_level('SILENT')

    cfg = ConfigNode({
        'GLOBAL': {'METHOD_TYPE': 'GaussianSplatting', 'RANDOM_SEED': 0},
        'MODEL': {}, 'RENDERER': {}, 'TRAINING': {},
    })
    model = Methods.get_model(cfg)
    rng = np.random.default_rng(0)
    pts = (rng.random((args.num, 3)).astype(np.float32) * 2.0 - 1.0)
    cols = rng.random((args.num, 3)).astype(np.float32)
    model.init_from_point_cloud(BasicPointCloud(pts, cols))
    renderer = Methods.get_renderer(cfg, model)

    h, w = args.height, args.width
    intrinsics = (0.8 * w, 0.8 * w, w / 2.0, h / 2.0, w, h)
    eye = np.array([0.0, 0.0, 3.0])
    c2w = np.eye(4)
    c2w[:3, 2] = [0, 0, -1.0]
    c2w[:3, 0] = [-1.0, 0, 0]
    c2w[:3, 3] = eye
    w2c = jnp.asarray(np.linalg.inv(c2w).astype(np.float32))
    cam = jnp.asarray(eye, jnp.float32)
    bg = jnp.zeros(3)
    params = model.params
    n = params['positions'].shape[0]
    offset = jnp.zeros((n, 2), jnp.float32)

    if args.which in ('train', 'all'):
        profile_train(model, renderer, intrinsics, w2c, cam, bg, params, h, w)
        if args.which == 'train':
            return

    # end to end
    fn = renderer._get_render_fn(intrinsics, int(model.active_sh_degree))
    timed(lambda p: fn(p, offset, w2c, cam, background=bg)['rgb'],
          (params,), label=f'render_image e2e ({args.num // 1000}k, '
          f'{w}x{h})')

    # stages
    from nerficg_tpu.ops.encoding import eval_sh
    from nerficg_tpu.ops.gaussian import build_covariance_3d, project_gaussians

    def proj_stage(p):
        cov3d = build_covariance_3d(model.get_scales(p),
                                    model.get_rotations(p))
        proj = project_gaussians(p['positions'], cov3d, w2c,
                                 *intrinsics, low_pass=0.3)
        dirs = p['positions'] - cam
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        colors = eval_sh(model.get_features(p), dirs,
                         int(model.active_sh_degree))
        return proj['means2d'], proj['depths'], proj['conics'], \
            proj['radii'], jnp.maximum(colors + 0.5, 0.0), \
            model.get_opacities(p), proj['in_frustum']

    outs = jax.jit(proj_stage)(params)
    timed(proj_stage, (params,), label='projection + SH color')

    means2d, depths, conics, radii, colors, opac, vis = outs

    from nerficg_tpu.ops import gs_rasterize as gr

    def full_raster(m2d, dep, con, rad, col, op, vi):
        return gr.rasterize_gaussians(
            m2d, dep, con, rad, col, op, vi, w, h, bg,
            max_tiles_per_gaussian=int(renderer.MAX_TILES_PER_GAUSSIAN),
            max_per_tile=int(renderer.MAX_PER_TILE),
            tile_chunk=int(renderer.TILE_CHUNK),
            packed_inference=True)['rgb']

    timed(full_raster, (means2d, depths, conics, radii, colors, opac, vis),
          label='rasterize_gaussians (dup+sort+hist+comp)')

    # duplication + packing + sort only
    TILE = gr.TILE
    tiles_x = -(-w // TILE)
    tiles_y = -(-h // TILE)
    num_tiles = tiles_x * tiles_y
    D = int(renderer.MAX_TILES_PER_GAUSSIAN)

    def dup_stage(m2d, dep, rad, con, col, op, vi):
        t_min_x = jnp.clip(((m2d[:, 0] - rad) // TILE).astype(jnp.int32),
                           0, tiles_x - 1)
        t_max_x = jnp.clip(((m2d[:, 0] + rad) // TILE).astype(jnp.int32),
                           0, tiles_x - 1)
        t_min_y = jnp.clip(((m2d[:, 1] - rad) // TILE).astype(jnp.int32),
                           0, tiles_y - 1)
        t_max_y = jnp.clip(((m2d[:, 1] + rad) // TILE).astype(jnp.int32),
                           0, tiles_y - 1)
        rect_w = t_max_x - t_min_x + 1
        j = jnp.arange(D, dtype=jnp.int32)
        tx = t_min_x[:, None] + j[None, :] % rect_w[:, None]
        ty = t_min_y[:, None] + j[None, :] // rect_w[:, None]
        dup_valid = (tx <= t_max_x[:, None]) & (ty <= t_max_y[:, None]) & \
            vi[:, None] & (rad[:, None] > 0)
        tile_of_entry = jnp.where(dup_valid, ty * tiles_x + tx, num_tiles)
        # Unpacked 10-channel transport (the train path's layout; the
        # packed inference path fuses its u32 packing into
        # gs_rasterize._sort_entries_packed and is measured above via
        # full_raster).
        attrs = jnp.stack([m2d[:, 0], m2d[:, 1], con[:, 0], con[:, 1],
                           con[:, 2], op, col[:, 0], col[:, 1], col[:, 2],
                           dep], axis=0)
        ch = jnp.broadcast_to(attrs[:, :, None],
                              attrs.shape + (D,)).reshape(attrs.shape[0], -1)
        return tile_of_entry.reshape(-1), ch, \
            jnp.broadcast_to(dep[:, None], (dep.shape[0], D)).reshape(-1)

    tile_e, ch_e, dep_e = jax.jit(dup_stage)(
        means2d, depths, radii, conics, colors, opac, vis)
    timed(dup_stage, (means2d, depths, radii, conics, colors, opac, vis),
          label='duplicate + pack attrs')

    def sort_stage(te, ce, de):
        return gr._permute_entries(te.astype(jnp.float32), de, ce)

    timed(sort_stage, (tile_e, ch_e, dep_e),
          label='payload sort (2 keys + pos + 6ch)')

    def sort_fused_key(te, ce, de):
        dq = jnp.clip((de * 1024.0), 0, (1 << 18) - 1).astype(jnp.int32)
        key = te * (1 << 18) + dq
        ops = jax.lax.sort((key,) + tuple(ce), num_keys=1)
        return ops[0], jnp.stack(ops[1:])

    timed(sort_fused_key, (tile_e, ch_e, dep_e),
          label='payload sort (1 fused int key + 6ch)')

    sorted_tile_f, sorted_ch = jax.jit(sort_stage)(tile_e, ch_e, dep_e)
    sorted_tile = sorted_tile_f.astype(jnp.int32)

    def hist_stage(st):
        from nerficg_tpu.ops.hash_mxu import mxu_scatter_add
        e = st.shape[0]
        seg_pad = -(-(num_tiles + 1) // 128) * 128
        ones = jnp.ones((1, 1, e), jnp.float32)
        counts = mxu_scatter_add(st[None], ones, seg_pad // 128,
                                 compute_dtype=jnp.float32)
        counts = counts.reshape(seg_pad)[:num_tiles].astype(jnp.int32)
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(counts)[:-1]])
        return counts, starts

    counts, starts = jax.jit(hist_stage)(sorted_tile)
    timed(hist_stage, (sorted_tile,), label='histogram + starts (MXU)')

    k = int(renderer.MAX_PER_TILE)
    e = tile_e.shape[0]
    n_ch = sorted_ch.shape[0]

    def comp_stage(sc, st, cn):
        from nerficg_tpu.ops.gs_tiles_kernel import composite_sorted
        e_pad = (-(-(e + 3 * k) // k)) * k
        sm = jnp.concatenate(
            [sc, jnp.zeros((n_ch, e_pad - e), sc.dtype)], axis=1)
        sm = jnp.concatenate(
            [sm, jnp.zeros((8 - n_ch, e_pad), sc.dtype)], axis=0)
        return composite_sorted(sm, st, cn, tiles_x, num_tiles, k)

    timed(comp_stage, (sorted_ch, starts, counts),
          label='fused composite (sorted stream)')


def profile_train(model, renderer, intrinsics, w2c, cam, bg, params, h, w):
    """Training fwd+bwd stage budget at the same operating point.

    The train path (packed_inference=False) carries 10 f32 channels through
    a 2-key sort and routes gradients back via the custom VJPs; this section
    locates the cost so the round-3 inference wins can be ported
    (VERDICT r3 next #4)."""
    import optax
    from nerficg_tpu.optim.losses import dssim as dssim_fn

    n = params['positions'].shape[0]
    offset = jnp.zeros((n, 2), jnp.float32)
    target = jnp.zeros((h, w, 3), jnp.float32)
    sh_degree = int(model.active_sh_degree)

    def render_train(p, off):
        return renderer.render_impl(p, off, w2c, cam, intrinsics=intrinsics,
                                    background=bg, sh_degree=sh_degree)

    timed(lambda p: render_train(p, offset)['rgb'], (params,),
          label='train render fwd (unpacked path)')

    def loss_fn(p, off):
        out = render_train(p, off)
        l1 = jnp.mean(jnp.abs(out['rgb'] - target))
        ds = dssim_fn(out['rgb'], target)
        return 0.8 * l1 + 0.2 * ds

    timed(lambda p: loss_fn(p, offset), (params,),
          label='train loss fwd (render+L1+DSSIM)')

    def grad_step(p):
        g, go = jax.grad(loss_fn, argnums=(0, 1))(p, offset)
        return g['positions']

    timed(grad_step, (params,), label='train fwd+bwd (no adam)')

    optimizer = optax.adam(1e-3, eps=1e-15)
    opt_state = optimizer.init(params)

    def full_step(p, o):
        g, go = jax.grad(loss_fn, argnums=(0, 1))(p, offset)
        updates, o = optimizer.update(g, o, p)
        return optax.apply_updates(p, updates), o

    fs = jax.jit(full_step)
    p, o = fs(jax.tree_util.tree_map(jnp.copy, params), opt_state)
    jax.block_until_ready(p['positions'])
    import time as _t
    start = _t.perf_counter()
    for _ in range(30):
        p, o = fs(p, o)
    jax.block_until_ready(p['positions'])
    print(f'{"train full step (fwd+bwd+adam)":46s} '
          f'{(_t.perf_counter() - start) / 30 * 1000.0:8.3f} ms')

    # loss-only on a fixed rendered image (DSSIM cost isolation)
    img = jax.jit(lambda p: render_train(p, offset)['rgb'])(params)

    def loss_only(im):
        l1 = jnp.mean(jnp.abs(im - target))
        return 0.8 * l1 + 0.2 * dssim_fn(im, target)

    timed(lambda im: jax.grad(loss_only)(im), (img,),
          label='L1+DSSIM fwd+bwd (1080p)')

    # sort fwd+bwd in isolation (the 2-key 13-operand train sort)
    from nerficg_tpu.ops import gs_rasterize as gr
    rng = jax.random.PRNGKey(0)
    e = n * int(renderer.MAX_TILES_PER_GAUSSIAN)
    tile_e = jax.random.randint(rng, (e,), 0, 8160).astype(jnp.float32)
    dep_e = jax.random.uniform(jax.random.PRNGKey(1), (e,))
    ch_e = jax.random.normal(jax.random.PRNGKey(2), (10, e))

    def sort_fwd(te, de, ce):
        return gr._permute_entries(te, de, ce)[1]

    timed(sort_fwd, (tile_e, dep_e, ch_e),
          label=f'train sort fwd (2key+10ch, E={e // 1000}k)')

    def sort_fwdbwd(te, de, ce):
        def f(c):
            return jnp.sum(gr._permute_entries(te, de, c)[1] ** 2)
        return jax.grad(f)(ce)

    timed(sort_fwdbwd, (tile_e, dep_e, ch_e),
          label='train sort fwd+bwd')

    # composite_sorted fwd / fwd+bwd in isolation (16-ch train layout)
    from nerficg_tpu.ops.gs_tiles_kernel import composite_sorted
    tiles_x = -(-w // 16)
    num_tiles = tiles_x * (-(-h // 16))
    kk = int(renderer.MAX_PER_TILE)
    e_pad = (-(-(e + 3 * kk) // kk)) * kk
    sc_tile = jnp.sort(jax.random.randint(rng, (e,), 0, num_tiles))
    edges = jnp.searchsorted(sc_tile,
                             jnp.arange(num_tiles + 1, dtype=jnp.int32))
    cs_starts = edges[:-1].astype(jnp.int32)
    cs_counts = (edges[1:] - edges[:-1]).astype(jnp.int32)
    sm = jnp.concatenate([
        jax.random.uniform(jax.random.PRNGKey(3), (16, e)) * 0.1,
        jnp.zeros((16, e_pad - e))], axis=1)

    def cs_fwd(m):
        return composite_sorted(m, cs_starts, cs_counts, tiles_x,
                                num_tiles, kk)

    timed(cs_fwd, (sm,), label='composite_sorted fwd (16ch)')

    def cs_fwdbwd(m):
        return jax.grad(lambda x: jnp.sum(cs_fwd(x)[:, 0:5] ** 2))(m)

    timed(cs_fwdbwd, (sm,), label='composite_sorted fwd+bwd')


if __name__ == '__main__':
    main()
