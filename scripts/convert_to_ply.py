#!/usr/bin/env python3
"""Export a trained model's point representation to PLY.

Reference equivalent: scripts/convert_to_ply.py:18-44
(model.get_ply_dict() -> plyfile writer; here our own PLY writer).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nerficg_tpu.core.logging import Logger
from nerficg_tpu.core.registry import Methods
from nerficg_tpu.core.setup import setup, teardown
from nerficg_tpu.data.ply import write_ply_vertices


def main() -> None:
    parser = argparse.ArgumentParser(description='export model to .ply')
    parser.add_argument('-d', '--run-dir', required=True)
    parser.add_argument('-o', '--output', default=None)
    parser.add_argument('--checkpoint', default='final.ckpt')
    args = parser.parse_args()

    run_dir = Path(args.run_dir)
    ctx = setup(run_dir / 'training_config.yaml')
    model = Methods.get_model(
        ctx.config, checkpoint=str(run_dir / 'checkpoints' / args.checkpoint))
    ply = model.get_ply_dict()
    if not ply:
        Logger.error(f'{type(model).__name__} does not support PLY export')
        return
    output = Path(args.output) if args.output else run_dir / 'export.ply'
    write_ply_vertices(ply, output)
    Logger.info(f'wrote {output} ({len(ply["x"])} vertices)')
    teardown(ctx)


if __name__ == '__main__':
    main()
