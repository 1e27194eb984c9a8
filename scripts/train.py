#!/usr/bin/env python3
"""Train a method on a dataset from a YAML config.

Reference equivalent: scripts/train.py:12-25.

Usage:
    python scripts/train.py -c configs/nerf_lego.yaml [KEY.SUBKEY=value ...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nerficg_tpu.core.registry import Datasets, Methods
from nerficg_tpu.core.setup import default_argparser, setup, teardown


def main() -> None:
    args = default_argparser('train a radiance-field method').parse_args()
    ctx = setup(args.config, args.overrides)
    trainer = Methods.get_training_instance(ctx.config)
    dataset = Datasets.get_dataset(ctx.config)
    resume = ctx.config.get_path('TRAINING.LOAD_CHECKPOINT')
    if resume:
        trainer.load_training_state(resume)
    trainer.run(dataset)
    teardown(ctx)


if __name__ == '__main__':
    main()
