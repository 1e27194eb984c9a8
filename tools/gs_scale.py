#!/usr/bin/env python3
"""GS count-scaling: inference FPS and train-step ms vs Gaussian count.

VERDICT r3 next #5: the 60 FPS target only means something near scene-scale
counts (reference scenes carry millions — garden ~5.8M; the model supports
MAX_CAPACITY=4194304). This sweeps the two driver bench measurements
(bench.measure_gs_fps / measure_gs_train_ms, 1080p, the real render/train
paths) over counts and prints one JSON line per point.

Run on the TPU chip: `python tools/gs_scale.py [--counts 100000,1000000]
[--skip-train]`.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--counts', default='100000,500000,1000000,4000000')
    parser.add_argument('--skip-train', action='store_true')
    parser.add_argument('--skip-fps', action='store_true')
    parser.add_argument('--frames', type=int, default=32)
    parser.add_argument('--train-iters', type=int, default=20)
    args = parser.parse_args()

    import bench

    import numpy as np
    import jax.numpy as jnp

    for n in (int(c) for c in args.counts.split(',')):
        row = {'n_gaussians': n}
        if not args.skip_fps:
            fps = bench.measure_gs_fps(n_gaussians=n, frames=args.frames)
            row['infer_fps_1080p'] = round(fps, 2)
            row['infer_ms'] = round(1000.0 / fps, 2)
        if not args.skip_train:
            ms = bench.measure_gs_train_ms(n_gaussians=n,
                                           iters=args.train_iters)
            row['train_step_ms'] = round(ms, 2)
        # Truncation diagnostics at this count (VERDICT r4 next #3: the
        # static budgets MAX_PER_TILE / MAX_TILES_PER_GAUSSIAN must be
        # *observed*, not assumed, at scene-scale counts): one training-path
        # render, read the coverage-loss counters off the result dict.
        cfg, model, renderer = bench._make_gs_model(n)
        h, w = 1080, 1920
        intrinsics = (0.8 * w, 0.8 * w, w / 2.0, h / 2.0, w, h)
        eye = np.array([0.0, 0.0, 3.0])
        c2w = np.eye(4)
        c2w[:3, 2] = [0, 0, -1.0]
        c2w[:3, 0] = [-1.0, 0, 0]
        c2w[:3, 3] = eye
        w2c = jnp.asarray(np.linalg.inv(c2w).astype(np.float32))
        n_model = model.params['positions'].shape[0]
        out = renderer.render_impl(
            model.params, jnp.zeros((n_model, 2), jnp.float32), w2c,
            jnp.asarray(eye, jnp.float32), intrinsics=intrinsics,
            background=jnp.zeros(3),
            sh_degree=int(model.active_sh_degree))
        row['overflow_gaussians'] = int(out['overflow_gaussians'])
        row['overflow_entries'] = int(out['overflow_entries'])
        row['visible_gaussians'] = int(jnp.sum(out['visible']))
        print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
