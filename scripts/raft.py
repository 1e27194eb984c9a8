#!/usr/bin/env python3
"""Optical-flow annotation (RAFT) for dynamic-scene datasets.

Reference equivalent: scripts/raft.py:20-119 — torchvision RAFT forward and
backward flow between consecutive frames, written as Middlebury .flo plus a
color visualization. torchvision is optional in this image; the script
reports clearly when it is unavailable.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nerficg_tpu.core.logging import Logger
from nerficg_tpu.data.io import flow_to_color, load_image, save_image, write_flow


def main() -> None:
    parser = argparse.ArgumentParser(description='RAFT optical-flow annotation')
    parser.add_argument('-p', '--path', required=True)
    parser.add_argument('--image-dir', default='images')
    parser.add_argument('--output-dir', default='flow')
    args = parser.parse_args()

    try:
        import torch
        from torchvision.models.optical_flow import (Raft_Small_Weights,
                                                     raft_small)
    except ImportError:
        Logger.error('torchvision (with RAFT weights) is required for flow '
                     'annotation; it is not installed in this environment')
        sys.exit(1)

    weights = Raft_Small_Weights.DEFAULT
    model = raft_small(weights=weights).eval()
    transform = weights.transforms()

    scene = Path(args.path)
    out_dir = scene / args.output_dir
    out_dir.mkdir(exist_ok=True)
    images = sorted(p for p in (scene / args.image_dir).glob('*')
                    if p.suffix.lower() in ('.png', '.jpg', '.jpeg'))

    def to_tensor(path):
        img = load_image(path)[..., :3]
        return torch.from_numpy(img).permute(2, 0, 1)[None]

    for a, b, tag in [(i, i + 1, 'fwd') for i in range(len(images) - 1)] + \
                     [(i, i - 1, 'bwd') for i in range(1, len(images))]:
        t1, t2 = transform(to_tensor(images[a]), to_tensor(images[b]))
        with torch.no_grad():
            flow = model(t1, t2)[-1][0].permute(1, 2, 0).numpy()
        stem = images[a].stem
        write_flow(flow, out_dir / f'{stem}_{tag}.flo')
        save_image(flow_to_color(flow), out_dir / f'{stem}_{tag}.png')
        Logger.info(f'{stem} {tag} flow saved')


if __name__ == '__main__':
    main()
