#!/usr/bin/env python3
"""Offline metric tables over rendered image trees (root/scene/method).

Reference equivalent: scripts/generate_tables.py:1-219 — compute a
configurable metric set (PSNR/SSIM/LPIPS + masked variants) over
prediction/GT image directories and emit text + LaTeX tables.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nerficg_tpu.core.logging import Logger
from nerficg_tpu.data.io import load_image
from nerficg_tpu.optim.masked_metrics import compute_masked_metrics
from nerficg_tpu.optim.metrics import compute_all_metrics


def evaluate_dir(pred_dir: Path, gt_dir: Path,
                 mask_dir: Path | None = None) -> dict[str, float]:
    preds = sorted(pred_dir.glob('*.png')) + sorted(pred_dir.glob('*.jpg'))
    per_image = []
    for pred_path in preds:
        gt_path = gt_dir / pred_path.name
        if not gt_path.is_file():
            continue
        pred = load_image(pred_path)[..., :3]
        gt = load_image(gt_path)[..., :3]
        metrics = compute_all_metrics(pred, gt)
        if mask_dir is not None:
            mask_path = mask_dir / pred_path.name
            if mask_path.is_file():
                mask = load_image(mask_path)[..., 0]
                metrics.update(compute_masked_metrics(pred, gt, mask))
        per_image.append(metrics)
    if not per_image:
        return {}
    return {k: float(np.nanmean([m[k] for m in per_image]))
            for k in per_image[0]}


def main() -> None:
    parser = argparse.ArgumentParser(
        description='offline metric tables over root/scene/method image trees')
    parser.add_argument('-r', '--root', required=True)
    parser.add_argument('-g', '--gt-name', default='gt',
                        help='name of the GT directory inside each scene')
    parser.add_argument('-m', '--mask-name', default=None)
    parser.add_argument('-o', '--output', default=None)
    args = parser.parse_args()

    root = Path(args.root)
    rows = []
    for scene_dir in sorted(p for p in root.iterdir() if p.is_dir()):
        gt_dir = scene_dir / args.gt_name
        if not gt_dir.is_dir():
            continue
        mask_dir = scene_dir / args.mask_name if args.mask_name else None
        for method_dir in sorted(p for p in scene_dir.iterdir()
                                 if p.is_dir() and p.name != args.gt_name
                                 and (mask_dir is None or p != mask_dir)):
            metrics = evaluate_dir(method_dir, gt_dir, mask_dir)
            if metrics:
                rows.append((scene_dir.name, method_dir.name, metrics))

    lines = []
    for scene, method, metrics in rows:
        line = f'{scene:20s} {method:20s} ' + ' '.join(
            f'{k}={v:.4f}' for k, v in metrics.items())
        lines.append(line)
        Logger.info(line)
    if args.output:
        out = Path(args.output)
        out.parent.mkdir(parents=True, exist_ok=True)
        with open(out, 'w') as f:
            f.write('\n'.join(lines) + '\n')
            f.write('\n% LaTeX\n\\begin{tabular}{ll%s}\n' %
                    ('c' * (len(rows[0][2]) if rows else 0)))
            for scene, method, metrics in rows:
                f.write(f'{scene} & {method} & ' +
                        ' & '.join(f'{v:.3f}' for v in metrics.values()) +
                        ' \\\\\n')
            f.write('\\end{tabular}\n')
        Logger.info(f'wrote {out}')


if __name__ == '__main__':
    main()
