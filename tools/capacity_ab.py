#!/usr/bin/env python3
"""Capacity A/B: throughput + quality of the hash encode as the per-level
table grows 2^14 -> 2^19 (the reference tcnn operating point,
/root/reference/src/Methods/InstantNGP/Model.py:20 HASHGRID_LOG2_SIZE=19).

Two measurements per capacity K:
  1. train-step wall time at the 262144-samples/step operating point (the
     claim under test: the windowed/cell encode's scan cost follows scene
     locality, NOT table extent — VERDICT round 2 missing #1, round 3 #3);
  2. end-to-end PSNR on the procedural quality probe (bench.py --quality
     path), which anchors that bigger tables buy quality (or at least do
     not regress).

Run on the TPU chip: `python tools/capacity_ab.py [--ks 14,16,18]
[--iters 3000] [--image-size 128] [--backend cell]`.
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update('jax_compilation_cache_dir', str(Path.home() / '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)

from _common import make_synthetic_trainer, time_full_step


def measure_throughput(log2_size: int, backend: str) -> float:
    """ms per full train step (8192 rays / 262k samples) at capacity 2^K."""
    env = make_synthetic_trainer(
        model_overrides={'LOG2_HASHMAP_SIZE': int(log2_size),
                         'ENCODING_BACKEND': backend})
    return time_full_step(env, iters=60)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--ks', default='14,16,18')
    parser.add_argument('--iters', type=int, default=3000)
    parser.add_argument('--image-size', type=int, default=128)
    parser.add_argument('--backend', default='cell')
    parser.add_argument('--scene', default=None,
                        help='quality probe scene preset (bench.py --scene)')
    parser.add_argument('--skip-quality', action='store_true')
    parser.add_argument('--quality-timeout', type=float, default=3600.0)
    args = parser.parse_args()
    ks = [int(k) for k in args.ks.split(',')]

    rows = []
    for k in ks:
        ms = measure_throughput(k, args.backend)
        rows.append({'log2_size': k, 'step_ms': round(ms, 3),
                     'rays_per_s': round(8192 / (ms / 1000.0))})
        print(json.dumps(rows[-1]), flush=True)

    if not args.skip_quality:
        for k in ks:
            cmd = [sys.executable,
                   str(Path(__file__).parents[1] / 'bench.py'),
                   '--quality', '--iters', str(args.iters),
                   '--image-size', str(args.image_size),
                   '--model', f'LOG2_HASHMAP_SIZE={k}',
                   '--model', f'ENCODING_BACKEND={args.backend}']
            if args.scene:
                cmd += ['--scene', args.scene]
            try:
                out = subprocess.run(cmd, capture_output=True, text=True,
                                     timeout=args.quality_timeout)
            except subprocess.TimeoutExpired:
                print(json.dumps({'log2_size': k, 'quality': 'TIMEOUT'}),
                      flush=True)
                continue
            line = [l for l in out.stdout.splitlines() if l.startswith('{')]
            if out.returncode != 0 or not line:
                print(json.dumps({'log2_size': k, 'quality': 'FAILED',
                                  'returncode': out.returncode,
                                  'stderr_tail': out.stderr[-400:]}),
                      flush=True)
                continue
            print(f'K={k}: {line[-1]}', flush=True)


if __name__ == '__main__':
    main()
