"""Camera trajectory plugins for novel-view rendering.

Reference equivalent: src/Visual/Trajectories/ (plugin base utils.py:15-62 and
seven implementations). Trajectories register themselves and become extra
dataset "subsets" renderable by scripts/inference.py -s <name>.
"""

from nerficg_tpu.visual.trajectories.base import CameraTrajectory, lemniscate_poses
from nerficg_tpu.visual.trajectories import builtin  # noqa: F401  (registers)
