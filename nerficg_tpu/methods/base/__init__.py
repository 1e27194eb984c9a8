from nerficg_tpu.methods.base.callbacks import (CallbackTimer,
                                                post_training_callback,
                                                pre_training_callback,
                                                training_callback)
from nerficg_tpu.methods.base.model import BaseModel
from nerficg_tpu.methods.base.renderer import BaseRenderer
from nerficg_tpu.methods.base.trainer import BaseTrainer
