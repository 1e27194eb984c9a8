from nerficg_tpu.core.config import (ConfigNode, Configurable, apply_overrides,
                                     default_global_config, load_config,
                                     recursive_update, save_config)
from nerficg_tpu.core.errors import *  # noqa: F401,F403
from nerficg_tpu.core.logging import Logger
from nerficg_tpu.core.registry import Datasets, Methods, register_dataset, register_method
from nerficg_tpu.core.setup import (Directories, FrameworkContext, default_argparser,
                                    setup, teardown)
