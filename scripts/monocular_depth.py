#!/usr/bin/env python3
"""Monocular depth annotation (MiDaS / Depth-Anything-V2 via torch hub).

Reference equivalent: scripts/monocular_depth.py:24-180 — relative depth per
image saved as .npy plus a colorized preview png, consumed by the Colmap
loader's LOAD_DEPTH path. Requires torch with network access for the model
weights (gated: reports clearly when unavailable).
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nerficg_tpu.core.logging import Logger
from nerficg_tpu.data.io import load_image, save_image


def load_midas():
    import torch
    model = torch.hub.load('intel-isl/MiDaS', 'MiDaS_small')
    transforms = torch.hub.load('intel-isl/MiDaS', 'transforms').small_transform
    model.eval()
    return model, transforms


def main() -> None:
    parser = argparse.ArgumentParser(description='monocular depth annotation')
    parser.add_argument('-p', '--path', required=True,
                        help='scene dir with an images/ folder')
    parser.add_argument('--model', choices=['midas'], default='midas')
    parser.add_argument('--image-dir', default='images')
    parser.add_argument('--output-dir', default='depth')
    args = parser.parse_args()

    try:
        import torch
    except ImportError:
        Logger.error('torch is required for monocular depth estimation')
        sys.exit(1)
    try:
        model, transform = load_midas()
    except Exception as exc:
        Logger.error(f'could not load MiDaS weights (network needed?): {exc}')
        sys.exit(1)

    scene = Path(args.path)
    out_dir = scene / args.output_dir
    out_dir.mkdir(exist_ok=True)
    images = sorted((scene / args.image_dir).glob('*'))
    from nerficg_tpu.visual.colormaps import apply_color_map
    import jax.numpy as jnp
    for img_path in images:
        if img_path.suffix.lower() not in ('.png', '.jpg', '.jpeg'):
            continue
        img = (load_image(img_path)[..., :3] * 255).astype(np.uint8)
        with torch.no_grad():
            pred = model(transform(img))
            pred = torch.nn.functional.interpolate(
                pred.unsqueeze(1), size=img.shape[:2], mode='bicubic',
                align_corners=False).squeeze().cpu().numpy()
        np.save(out_dir / f'{img_path.stem}.npy', pred.astype(np.float32))
        viz = np.asarray(apply_color_map(jnp.asarray(pred), 'TURBO'))
        save_image(viz, out_dir / f'{img_path.stem}_viz.png')
        Logger.info(f'{img_path.name}: depth saved')


if __name__ == '__main__':
    main()
