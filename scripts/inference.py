#!/usr/bin/env python3
"""Render subsets / trajectories from a trained output dir; metrics; FPS bench.

Reference equivalent: scripts/inference.py:20-103 (render subsets with -m
metrics, -b online FPS benchmark: warmup then repeated test-set renders with
device-sync timing -> performance_<iters>.txt).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from nerficg_tpu.core.logging import Logger
from nerficg_tpu.core.registry import Datasets, Methods
from nerficg_tpu.core.setup import setup, teardown


def benchmark_fps(renderer, dataset, subset: str = 'test', repeats: int = 100,
                  output_dir: Path | None = None, iterations: int = 0) -> float:
    """Online FPS benchmark (reference: inference.py:62-97)."""
    import jax.numpy as jnp

    views = dataset.subsets[subset] or dataset.subsets['train']
    # Warmup/compile pass.
    out = renderer.render_image(views[0])
    # Timing fence: chain every frame into an on-device accumulator and fetch
    # it once — end-only syncs of un-fetched executions are untrustworthy
    # through the axon tunnel (PERF_NOTES "Benchmarking through the axon
    # tunnel"); a data dependency is the only reliable fence.
    acc = jnp.zeros(()) + jnp.asarray(out['rgb']).ravel()[0] * 1e-20
    float(acc)
    start = time.perf_counter()
    count = 0
    for _ in range(repeats):
        for view in views:
            out = renderer.render_image(view)
            acc = acc + jnp.asarray(out['rgb']).ravel()[0] * 1e-20
            count += 1
    float(acc)
    elapsed = time.perf_counter() - start
    fps = count / elapsed
    Logger.info(f'benchmark: {count} renders in {elapsed:.2f}s -> {fps:.2f} FPS')
    if output_dir is not None:
        with open(output_dir / f'performance_{iterations}.txt', 'w') as f:
            f.write(f'{count} renders in {elapsed:.4f}s\nFPS: {fps:.4f}\n')
    return fps


def main() -> None:
    parser = argparse.ArgumentParser(description='render from a trained model')
    parser.add_argument('-d', '--run-dir', required=True,
                        help='training output dir (contains training_config.yaml)')
    parser.add_argument('-s', '--subsets', nargs='*', default=['test'],
                        help='subsets and/or trajectory names to render')
    parser.add_argument('-m', '--metrics', action='store_true')
    parser.add_argument('-b', '--benchmark', action='store_true')
    parser.add_argument('--repeats', type=int, default=100)
    parser.add_argument('overrides', nargs='*', default=[])
    args = parser.parse_args()

    run_dir = Path(args.run_dir)
    ctx = setup(run_dir / 'training_config.yaml', args.overrides)
    dataset = Datasets.get_dataset(ctx.config)
    ckpt = run_dir / 'checkpoints' / 'final.ckpt'
    model = Methods.get_model(ctx.config, checkpoint=str(ckpt))
    renderer = Methods.get_renderer(ctx.config, model)

    from nerficg_tpu.visual.trajectories import CameraTrajectory
    for name in args.subsets:
        if name in dataset.subsets:
            renderer.render_subset(dataset, name,
                                   output_dir=run_dir / name,
                                   compute_metrics=args.metrics)
        elif name in CameraTrajectory.list_options():
            CameraTrajectory.get(name).add_to_dataset(dataset)
            renderer.render_subset(dataset, name, output_dir=run_dir / name,
                                   compute_metrics=False)
        else:
            Logger.warning(f'unknown subset/trajectory {name!r}; skipped')
    if args.benchmark:
        benchmark_fps(renderer, dataset, repeats=args.repeats,
                      output_dir=run_dir,
                      iterations=model.num_iterations_trained)
    teardown(ctx)


if __name__ == '__main__':
    main()
