from nerficg_tpu.gui.state import CameraPose, LaunchConfig, SharedState
from nerficg_tpu.gui.trainer import FPSRollingAverage, GuiTrainerMixin, with_gui
from nerficg_tpu.gui.web_viewer import launch_gui_process, run_viewer
