#!/usr/bin/env python3
"""Compose a default config YAML from method + dataset default parameters.

Reference equivalent: scripts/create_config.py:19-59.

Usage:
    python scripts/create_config.py -m NeRF -d NeRF -o configs/my.yaml [-p /data/scene]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nerficg_tpu.core.config import ConfigNode, default_global_config, save_config
from nerficg_tpu.core.logging import Logger
from nerficg_tpu.core.registry import Datasets, Methods


def build_config(method: str, dataset: str, path: str | None = None) -> ConfigNode:
    entry = Methods.get_entry(method)
    dataset_cls = Datasets.get_class(dataset)
    config = ConfigNode({
        'GLOBAL': default_global_config(),
        'MODEL': entry.model_cls.default_parameters(),
        'RENDERER': entry.renderer_cls.default_parameters(),
        'TRAINING': entry.trainer_cls.default_parameters(),
        'DATASET': dataset_cls.default_parameters(),
    })
    config.GLOBAL.METHOD_TYPE = method
    config.GLOBAL.DATASET_TYPE = dataset
    if path is not None:
        config.DATASET.PATH = path
    return config


def main() -> None:
    parser = argparse.ArgumentParser(description='generate a default config')
    parser.add_argument('-m', '--method', required=True, choices=Methods.options())
    parser.add_argument('-d', '--dataset', required=True, choices=Datasets.options())
    parser.add_argument('-o', '--output', required=True)
    parser.add_argument('-p', '--path', default=None, help='dataset path')
    parser.add_argument('-a', '--all-scenes', action='store_true',
                        help='emit one config per scene subdirectory of --path')
    args = parser.parse_args()

    if args.all_scenes and args.path:
        scenes = sorted(p for p in Path(args.path).iterdir() if p.is_dir())
        for scene in scenes:
            config = build_config(args.method, args.dataset, str(scene))
            out = Path(args.output).with_suffix('') / f'{scene.name}.yaml'
            save_config(config, out)
            Logger.info(f'wrote {out}')
    else:
        config = build_config(args.method, args.dataset, args.path)
        save_config(config, args.output)
        Logger.info(f'wrote {args.output}')


if __name__ == '__main__':
    main()
