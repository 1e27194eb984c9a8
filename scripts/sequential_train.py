#!/usr/bin/env python3
"""Run many training configs sequentially in subprocesses; summarize metrics.

Reference equivalent: scripts/sequential_train.py:23-118 — one subprocess per
config for clean device teardown, collecting each run's metrics_8bit.txt
last line into a summary table.
"""

import argparse
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nerficg_tpu.core.logging import Logger


def latest_run_dir(output_root: Path) -> Path | None:
    runs = sorted(output_root.glob('*/*/'), key=lambda p: p.stat().st_mtime)
    return runs[-1] if runs else None


def parse_metrics_line(run_dir: Path) -> str:
    metrics = run_dir / 'test' / 'metrics_8bit.txt'
    if metrics.is_file():
        return metrics.read_text().strip().splitlines()[-1]
    return 'no metrics'


def main() -> None:
    parser = argparse.ArgumentParser(
        description='train multiple configs sequentially')
    parser.add_argument('configs', nargs='+', help='config yaml paths')
    parser.add_argument('-o', '--output', default='output/summary.txt')
    parser.add_argument('--continue-on-error', action='store_true')
    args = parser.parse_args()

    results: list[tuple[str, str]] = []
    train_script = Path(__file__).parent / 'train.py'
    for config in args.configs:
        Logger.info(f'=== training {config} ===')
        proc = subprocess.run([sys.executable, str(train_script),
                               '-c', config])
        if proc.returncode != 0:
            results.append((config, f'FAILED (exit {proc.returncode})'))
            if not args.continue_on_error:
                break
            continue
        run_dir = latest_run_dir(Path('output'))
        results.append((config,
                        parse_metrics_line(run_dir) if run_dir else 'unknown'))

    summary_path = Path(args.output)
    summary_path.parent.mkdir(parents=True, exist_ok=True)
    with open(summary_path, 'w') as f:
        for config, line in results:
            f.write(f'{config}: {line}\n')
            Logger.info(f'{config}: {line}')
    Logger.info(f'summary written to {summary_path}')


if __name__ == '__main__':
    main()
