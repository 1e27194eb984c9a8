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
        print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
