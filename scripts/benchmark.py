#!/usr/bin/env python3
"""Full-dataset benchmark sweep: train every scene, tabulate metrics.

Reference equivalent: scripts/benchmark.py:68-239 — iterate scene dirs with
per-dataset config customizations, train each in a subprocess, parse
metrics/timings/memory files, emit a summary table (+ LaTeX).
"""

import argparse
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nerficg_tpu.core.config import ConfigNode, save_config
from nerficg_tpu.core.logging import Logger

# Per-scene customizations (reference: benchmark.py:36-50 applies MipNeRF360
# scale factors per scene class).
SCENE_OVERRIDES = {
    'MipNeRF360': {
        # outdoor scenes use images_4, indoor images_2
        'bicycle': {'DATASET.DOWNSAMPLE': 4}, 'garden': {'DATASET.DOWNSAMPLE': 4},
        'stump': {'DATASET.DOWNSAMPLE': 4}, 'flowers': {'DATASET.DOWNSAMPLE': 4},
        'treehill': {'DATASET.DOWNSAMPLE': 4},
        'room': {'DATASET.DOWNSAMPLE': 2}, 'counter': {'DATASET.DOWNSAMPLE': 2},
        'kitchen': {'DATASET.DOWNSAMPLE': 2}, 'bonsai': {'DATASET.DOWNSAMPLE': 2},
    },
}


def parse_run_files(run_dir: Path) -> dict:
    out = {'metrics': 'n/a', 'time': 'n/a', 'memory': 'n/a'}
    metrics = run_dir / 'test' / 'metrics_8bit.txt'
    if metrics.is_file():
        out['metrics'] = metrics.read_text().strip().splitlines()[-1]
    timings = run_dir / 'timings.txt'
    if timings.is_file():
        for line in timings.read_text().splitlines():
            if line.startswith('total:'):
                out['time'] = line.split(':', 1)[1].strip()
    mem = run_dir / 'vram_stats.txt'
    if mem.is_file():
        out['memory'] = mem.read_text().strip().splitlines()[0]
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description='benchmark a dataset sweep')
    parser.add_argument('-m', '--method', required=True)
    parser.add_argument('-d', '--dataset', required=True)
    parser.add_argument('-p', '--path', required=True,
                        help='root dir containing one subdir per scene')
    parser.add_argument('-o', '--output', default='output/benchmark')
    parser.add_argument('--scenes', nargs='*', default=None)
    parser.add_argument('overrides', nargs='*', default=[])
    args = parser.parse_args()

    from create_config import build_config

    root = Path(args.path)
    scenes = (args.scenes if args.scenes else
              sorted(p.name for p in root.iterdir() if p.is_dir()))
    out_root = Path(args.output)
    out_root.mkdir(parents=True, exist_ok=True)
    train_script = Path(__file__).parent / 'train.py'

    rows = []
    for scene in scenes:
        config = build_config(args.method, args.dataset, str(root / scene))
        config.TRAINING.MODEL_NAME = scene
        for key, value in SCENE_OVERRIDES.get(args.dataset, {}).get(
                scene, {}).items():
            config.set_path(key, value)
        cfg_path = out_root / f'{scene}.yaml'
        save_config(config, cfg_path)
        Logger.info(f'=== {args.method} / {scene} ===')
        proc = subprocess.run(
            [sys.executable, str(train_script), '-c', str(cfg_path),
             *args.overrides])
        if proc.returncode != 0:
            rows.append((scene, {'metrics': f'FAILED ({proc.returncode})',
                                 'time': '-', 'memory': '-'}))
            continue
        runs = sorted(Path('output').glob(f'*/{scene}_*/'),
                      key=lambda p: p.stat().st_mtime)
        rows.append((scene, parse_run_files(runs[-1]) if runs
                     else {'metrics': 'missing', 'time': '-', 'memory': '-'}))

    summary = out_root / 'summary.txt'
    latex = out_root / 'latex_tables.txt'
    with open(summary, 'w') as f, open(latex, 'w') as g:
        g.write('\\begin{tabular}{lccc}\nscene & metrics & time & memory \\\\\n')
        for scene, info in rows:
            line = (f'{scene}: {info["metrics"]} | time {info["time"]} | '
                    f'{info["memory"]}')
            f.write(line + '\n')
            Logger.info(line)
            g.write(f'{scene} & {info["metrics"]} & {info["time"]} & '
                    f'{info["memory"]} \\\\\n')
        g.write('\\end{tabular}\n')
    Logger.info(f'summary: {summary}')


if __name__ == '__main__':
    main()
