#!/usr/bin/env python3
"""Interactive video segmentation masks via Cutie.

Reference equivalent: scripts/cutie.py:27-223 — drives the external Cutie
video-object-segmentation tool (auto-installed into its own environment in
the reference) to produce per-frame masks consumed by the Colmap loader's
LOAD_MASKS path. This wrapper shells out to an existing ``cutie``
installation and degrades with a clear message otherwise.
"""

import argparse
import shutil
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nerficg_tpu.core.logging import Logger


def main() -> None:
    parser = argparse.ArgumentParser(description='Cutie mask annotation')
    parser.add_argument('-p', '--path', required=True)
    parser.add_argument('--image-dir', default='images')
    parser.add_argument('--output-dir', default='masks')
    parser.add_argument('--cutie-cmd', default='cutie',
                        help='Cutie CLI entry point')
    args = parser.parse_args()

    if shutil.which(args.cutie_cmd) is None:
        Logger.error(
            f'`{args.cutie_cmd}` not found on PATH. Install Cutie '
            '(github.com/hkchengrex/Cutie) and re-run, or provide masks '
            f'manually under {args.path}/{args.output_dir}/ as per-frame '
            'pngs named like the images.')
        sys.exit(1)

    scene = Path(args.path)
    out_dir = scene / args.output_dir
    out_dir.mkdir(exist_ok=True)
    result = subprocess.run([args.cutie_cmd,
                             '--images', str(scene / args.image_dir),
                             '--output', str(out_dir)])
    sys.exit(result.returncode)


if __name__ == '__main__':
    main()
