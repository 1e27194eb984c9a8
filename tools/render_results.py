#!/usr/bin/env python
"""Render the round-5 measurement battery results as markdown tables.

Reads the one-JSON-line-per-point files under ``tools/results_r5/``
(written by ``round5_battery.sh`` / ``round5_phase2.sh``) and prints the
tables that README.md / PERF_NOTES.md cite: the capacity-quality curve,
the cell-vs-window call, the march-grid A/B, the GS count-scaling curve,
and the DNeRF probe. Run with no arguments; missing points print as
``(pending)`` so partial batteries still render.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

R = Path(__file__).parent / 'results_r5'


def _last_json(path: Path):
    """Last parseable JSON object line in the file (tqdm noise ignored)."""
    if not path.exists():
        return None
    result = None
    for line in path.read_text(errors='replace').splitlines():
        line = line.strip()
        if line.startswith('{'):
            try:
                result = json.loads(line)
            except json.JSONDecodeError:
                continue
    return result


def _all_json(path: Path):
    if not path.exists():
        return []
    out = []
    for line in path.read_text(errors='replace').splitlines():
        line = line.strip()
        if line.startswith('{'):
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return out


def _psnr(name: str):
    d = _last_json(R / name)
    if d is None or 'value' not in d:
        return None
    return d['value']


def fmt(v, suffix=''):
    return f'{v}{suffix}' if v is not None else '(pending)'


def main() -> int:
    print('## Capacity-quality curve (textured probe, 3000 iters, 128px, '
          'cell encode)\n')
    # Step ms / rays/s columns come from tools/capacity_ab.py --skip-quality.
    thr = {}
    for d in _all_json(R / 'throughput_capacity.json'):
        if 'log2_size' in d and 'step_ms' in d:
            thr[int(d['log2_size'])] = d
    print('| Per-level table | Test PSNR | Step ms (262k samples) | rays/s |')
    print('|---|---|---|---|')
    for k in (14, 16, 18, 19):
        q = _psnr(f'quality_cell_k{k}.json')
        t = thr.get(k, {})
        label = f'2^{k}' + (' (reference operating point)' if k == 19 else '')
        print(f"| {label} | {fmt(q, ' dB')} | {fmt(t.get('step_ms'))} "
              f"| {fmt(t.get('rays_per_s'))} |")

    print('\n## Cell vs window encode at equal settings (gen-4 '
          'discontinuity call)\n')
    print('| Capacity | cell PSNR | window PSNR |')
    print('|---|---|---|')
    for k in (14, 19):
        print(f"| 2^{k} | {fmt(_psnr(f'quality_cell_k{k}.json'), ' dB')} "
              f"| {fmt(_psnr(f'quality_window_k{k}.json'), ' dB')} |")

    print('\n## March-grid A/B (2^19 cell encode)\n')
    print('| Grid / budget | Test PSNR |')
    print('|---|---|')
    print(f"| 64^3 @ 32 samples/ray | {fmt(_psnr('quality_march64.json'), ' dB')} |")
    print(f"| 128^3 @ 24 samples/ray | {fmt(_psnr('quality_march128.json'), ' dB')} |")

    print('\n## GS count scaling (1080p inference + train step)\n')
    rows = [d for d in _all_json(R / 'gs_scale.json') if 'n_gaussians' in d]
    print('| Gaussians | infer FPS | train step ms | overflow gaussians |')
    print('|---|---|---|---|')
    if rows:
        for d in rows:
            print(f"| {d['n_gaussians']:,} | {fmt(d.get('infer_fps_1080p'))} "
                  f"| {fmt(d.get('train_step_ms'))} "
                  f"| {fmt(d.get('overflow_gaussians'))} |")
    else:
        print('| (pending) | | | |')

    print('\n## DNeRF probe\n')
    d = _last_json(R / 'quality_dnerf.json')
    if d:
        print(f"PSNR {d.get('value')} dB ({d.get('train_seconds')}s train, "
              f"overrides {d.get('model_overrides')})")
    else:
        print('(pending)')

    print('\n## Headline / e2e\n')
    h = _last_json(R / 'bench_headline.json')
    if h:
        print('headline:', json.dumps(h))
    g = _last_json(R / 'gs_train_profile.json')
    if g:
        print('gs train profile:', json.dumps(g))
    p = _last_json(R / 'ingp_profile.json')
    if p:
        print('ingp profile:', json.dumps(p))
    return 0


if __name__ == '__main__':
    sys.exit(main())
