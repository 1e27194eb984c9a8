"""GUI-enabled training: live frame streaming from the training loop.

Reference equivalent: src/Methods/Base/GuiTrainer.py:51-233 — a pre-callback
spawns the GUI process, a per-N-iteration callback applies GUI camera /
config changes and streams a rendered frame + FPS, training status updates
flow continuously, the trainer honors terminate requests, and rendering
continues after training until the GUI closes.

``with_gui(TrainerCls)`` builds a GUI-enabled subclass of any method trainer
(the reference's GuiTrainer inheritance pattern, applied dynamically so every
method gets a GUI variant for free).
"""

from __future__ import annotations

import time

import numpy as np

from nerficg_tpu.cameras.perspective import PerspectiveCamera
from nerficg_tpu.cameras.pose import fov_to_focal
from nerficg_tpu.core.errors import catch
from nerficg_tpu.core.logging import Logger
from nerficg_tpu.data.types import View
from nerficg_tpu.gui.state import CameraPose, LaunchConfig
from nerficg_tpu.methods.base.callbacks import (post_training_callback,
                                                pre_training_callback,
                                                training_callback)

__all__ = ['GuiTrainerMixin', 'with_gui', 'FPSRollingAverage']


class FPSRollingAverage:
    """(reference: ICGui.util.FPSRollingAverage)"""

    def __init__(self, window: int = 20):
        self._times: list[float] = []
        self.window = window

    def tick(self) -> float:
        now = time.perf_counter()
        self._times.append(now)
        self._times = self._times[-self.window:]
        if len(self._times) < 2:
            return 0.0
        return (len(self._times) - 1) / (self._times[-1] - self._times[0])


class GuiTrainerMixin:
    """Adds live-view callbacks to a trainer (combine via ``with_gui``)."""

    GUI_RENDER_INTERVAL = 25     # iterations between live frames
    GUI_PORT = 8642

    @pre_training_callback(priority=9000)
    def _gui_init(self, dataset) -> None:
        """(reference: GuiTrainer.py:51-77)"""
        from nerficg_tpu.gui.web_viewer import launch_gui_process
        config = LaunchConfig(port=int(self.GUI_PORT))
        self._gui_state, self._gui_process = launch_gui_process(config)
        self._gui_fps = FPSRollingAverage()
        self._gui_view: View | None = None
        self._gui_state['is_training'] = True
        self._gui_state.advertise_configurables(
            {key: value for key, value in
             getattr(self.renderer, '_configuration', {}).items()})
        Logger.info(f'GUI viewer at http://127.0.0.1:{self.GUI_PORT}')

    def _pose_to_view(self, pose: CameraPose, dataset) -> View:
        settings = dataset.camera_settings
        height = int(pose.height)
        focal = fov_to_focal(np.deg2rad(pose.fov_y_deg), height)
        camera = PerspectiveCamera(width=int(pose.width), height=height,
                                   focal_x=focal, focal_y=focal,
                                   settings=settings)
        return View(camera=camera, c2w=pose.c2w, timestamp=pose.timestamp)

    def _stream_frame(self, state, rgb) -> None:
        """Double-buffered frame hand-off: start an async device->host copy
        of the new frame and push the PREVIOUS frame (whose copy has been
        overlapping with training/render work since the last call). The
        training loop never blocks on a synchronous device_get
        (reference equivalent: GuiTrainer.py streams via CUDA pinned-memory
        copies; here the overlap comes from jax's async dispatch)."""
        try:
            rgb.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass                      # non-device arrays: push synchronously
        prev = getattr(self, '_gui_pending_frame', None)
        self._gui_pending_frame = rgb
        if prev is not None:
            state.push_frame(np.asarray(prev))

    def _flush_frame(self, state) -> None:
        prev = getattr(self, '_gui_pending_frame', None)
        if prev is not None:
            self._gui_pending_frame = None
            state.push_frame(np.asarray(prev))

    @training_callback(priority=5, iteration_stride='GUI_RENDER_INTERVAL')
    @catch()
    def _gui_render_frame(self, dataset, iteration: int) -> None:
        """(reference: GuiTrainer.py:126-191)"""
        state = getattr(self, '_gui_state', None)
        if state is None or not self._gui_process.is_alive():
            return
        if state.terminate_training:
            Logger.warning('GUI requested training termination')
            raise KeyboardInterrupt
        # Apply renderer config changes from the GUI (reference: :134-146).
        for key, value in state.take_config_changes().items():
            if hasattr(self.renderer, key):
                setattr(self.renderer, key, value)
        pose = state['view']
        if pose is not None:
            self._gui_view = self._pose_to_view(pose, dataset)
        elif self._gui_view is None and dataset.subsets['train']:
            self._gui_view = dataset.subsets['train'][0].to_simple()
        if self._gui_view is None:
            return
        out = self.renderer.render_image(self._gui_view, rng=self.next_rng())
        self._stream_frame(state, out['rgb'])
        state['training_iteration'] = iteration
        state['fps'] = self._gui_fps.tick()

    @post_training_callback(priority=50)
    @catch()
    def _gui_post_training(self, dataset) -> None:
        """Keep rendering after training until the GUI closes
        (reference: GuiTrainer.py:92-99)."""
        state = getattr(self, '_gui_state', None)
        if state is None:
            return
        state['is_training'] = False
        self._flush_frame(state)
        Logger.info('training done; GUI stays interactive (ctrl-c to exit)')
        try:
            while self._gui_process.is_alive() and not state.terminate_training:
                pose = state['view']
                if pose is not None:
                    self._gui_view = self._pose_to_view(pose, dataset)
                if self._gui_view is not None:
                    out = self.renderer.render_image(self._gui_view)
                    self._stream_frame(state, out['rgb'])
                    state['fps'] = self._gui_fps.tick()
                else:
                    time.sleep(0.1)
        except KeyboardInterrupt:
            pass
        self._flush_frame(state)
        self._gui_process.terminate()


def with_gui(trainer_cls: type) -> type:
    """Build a GUI-enabled trainer class (falls back to the plain trainer on
    failure, mirroring the reference's optional-ICGui fallback,
    GuiTrainer.py:231-233)."""
    return type(f'Gui{trainer_cls.__name__}', (GuiTrainerMixin, trainer_cls), {})
