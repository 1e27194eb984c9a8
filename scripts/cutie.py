#!/usr/bin/env python3
"""Video segmentation masks for the Colmap loader's LOAD_MASKS path.

Reference equivalent: scripts/cutie.py:27-223 — drives the external Cutie
video-object-segmentation tool (auto-installed into its own conda
environment by the reference) to produce per-frame masks.

This version has two modes:
  * ``--backend cutie`` shells out to an installed Cutie CLI, exactly like
    the reference does (Cutie needs its own pretrained weights, which this
    environment cannot download).
  * ``--backend median`` (default fallback) is a built-in dependency-free
    segmenter for static-camera captures: it builds a per-pixel temporal
    median background model over the frames and thresholds the deviation,
    with morphological cleanup — good enough to bootstrap the dynamic-
    scene loaders' mask channel without external tools.

Masks are written as single-channel pngs named like the images, the layout
consumed by loaders with LOAD_MASKS (data/loaders/colmap.py).
"""

import argparse
import shutil
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from nerficg_tpu.core.logging import Logger

IMAGE_SUFFIXES = ('.png', '.jpg', '.jpeg')


def median_masks(image_dir: Path, out_dir: Path, threshold: float,
                 dilate: int) -> int:
    """Temporal-median background subtraction (static camera)."""
    from nerficg_tpu.data.io import load_image, save_image

    paths = sorted(p for p in image_dir.iterdir()
                   if p.suffix.lower() in IMAGE_SUFFIXES)
    if not paths:
        Logger.error(f'no images found in {image_dir}')
        return 0
    frames = np.stack([load_image(p)[..., :3] for p in
                       Logger.progress(paths, desc='loading frames')])
    background = np.median(frames, axis=0)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = 0
    for path, frame in zip(paths, frames):
        dev = np.abs(frame - background).max(axis=-1)
        mask = (dev > threshold).astype(np.float32)
        # morphological closing/dilation via separable max filters
        for _ in range(max(dilate, 0)):
            m = mask
            for axis in (0, 1):
                m = np.maximum(m, np.roll(mask, 1, axis))
                m = np.maximum(m, np.roll(mask, -1, axis))
            mask = m
        save_image(mask[..., None], out_dir / (path.stem + '.png'))
        written += 1
    return written


def main() -> None:
    parser = argparse.ArgumentParser(description='video segmentation masks')
    parser.add_argument('-p', '--path', required=True)
    parser.add_argument('--image-dir', default='images')
    parser.add_argument('--output-dir', default='masks')
    parser.add_argument('--backend', choices=('median', 'cutie'),
                        default='median')
    parser.add_argument('--threshold', type=float, default=0.08,
                        help='median-backend deviation threshold in [0,1]')
    parser.add_argument('--dilate', type=int, default=2)
    parser.add_argument('--cutie-cmd', default='cutie')
    args = parser.parse_args()

    scene = Path(args.path)
    image_dir = scene / args.image_dir
    out_dir = scene / args.output_dir

    if args.backend == 'cutie':
        if shutil.which(args.cutie_cmd) is None:
            Logger.error(
                f'`{args.cutie_cmd}` not found on PATH. Install Cutie '
                '(github.com/hkchengrex/Cutie) or use --backend median.')
            sys.exit(1)
        rc = subprocess.call([args.cutie_cmd, '--video', str(image_dir),
                              '--output', str(out_dir)])
        sys.exit(rc)

    n = median_masks(image_dir, out_dir, args.threshold, args.dilate)
    Logger.info(f'wrote {n} masks to {out_dir}')


if __name__ == '__main__':
    main()
