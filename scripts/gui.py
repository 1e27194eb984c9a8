#!/usr/bin/env python3
"""Standalone interactive viewer on a trained checkpoint.

Reference equivalent: scripts/gui.py:29-47 — launch the GUI process and a
``CheckpointRunner`` render loop over a checkpoint. Here the GUI is the
built-in web viewer (nerficg_tpu/gui/web_viewer.py); open the printed URL in
a browser and orbit with the mouse.

Usage:
    python scripts/gui.py -d output/<method>/<run>/ [--port 8642]
    python scripts/gui.py -c config.yaml --train      # GUI-attached training
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nerficg_tpu.core.logging import Logger
from nerficg_tpu.core.registry import Datasets, Methods
from nerficg_tpu.core.setup import setup, teardown
from nerficg_tpu.gui.state import LaunchConfig
from nerficg_tpu.gui.web_viewer import launch_gui_process


def checkpoint_runner(run_dir: Path, port: int) -> None:
    """Render loop over a checkpoint (reference: ICGui.Backend.CheckpointRunner)."""
    # Start the viewer first so the page is reachable while the model loads
    # and the first render compiles.
    state, process = launch_gui_process(LaunchConfig(port=port))
    Logger.info(f'viewer at http://127.0.0.1:{port} — ctrl-c to exit')

    ctx = setup(run_dir / 'training_config.yaml')
    ctx.config.GLOBAL.DATASET_TYPE = ctx.config.GLOBAL.DATASET_TYPE or 'Empty'
    try:
        dataset = Datasets.get_dataset(ctx.config)
    except Exception:
        dataset = Datasets.get_dataset(ctx.config, name='Empty')
    model = Methods.get_model(
        ctx.config, checkpoint=str(run_dir / 'checkpoints' / 'final.ckpt'))
    renderer = Methods.get_renderer(ctx.config, model)
    from nerficg_tpu.gui.trainer import FPSRollingAverage, GuiTrainerMixin
    fps = FPSRollingAverage()
    mixin = GuiTrainerMixin()
    view = dataset.subsets['train'][0].to_simple() \
        if dataset.subsets['train'] else None
    try:
        while process.is_alive() and not state.terminate_training:
            pose = state['view']
            if pose is not None:
                view = mixin._pose_to_view(pose, dataset)
            if view is None:
                time.sleep(0.1)
                continue
            out = renderer.render_image(view)
            state.push_frame(np.asarray(out['rgb']))
            state['fps'] = fps.tick()
    except KeyboardInterrupt:
        pass
    process.terminate()
    teardown(ctx)


def main() -> None:
    parser = argparse.ArgumentParser(description='interactive web viewer')
    parser.add_argument('-d', '--run-dir', default=None,
                        help='trained output dir (checkpoint viewing)')
    parser.add_argument('-c', '--config', default=None,
                        help='config for GUI-attached training (--train)')
    parser.add_argument('--train', action='store_true')
    parser.add_argument('--port', type=int, default=8642)
    parser.add_argument('overrides', nargs='*', default=[])
    args = parser.parse_args()

    if args.train:
        from nerficg_tpu.gui.trainer import with_gui
        ctx = setup(args.config, args.overrides)
        method = ctx.config.GLOBAL.METHOD_TYPE
        entry = Methods.get_entry(method)
        model = Methods.get_model(ctx.config)
        renderer = entry.renderer_cls(ctx.config, model)
        trainer_cls = with_gui(entry.trainer_cls)
        trainer = trainer_cls(ctx.config, model, renderer)
        trainer.GUI_PORT = args.port
        dataset = Datasets.get_dataset(ctx.config)
        trainer.run(dataset)
        teardown(ctx)
    elif args.run_dir:
        checkpoint_runner(Path(args.run_dir), args.port)
    else:
        parser.error('provide --run-dir (view checkpoint) or --train -c cfg')


if __name__ == '__main__':
    main()
