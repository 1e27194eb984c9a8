from nerficg_tpu.optim.losses import LossContainer
from nerficg_tpu.optim.lr import exponential_decay, lr_decay_policy, multistep_lr
from nerficg_tpu.optim.metrics import psnr, ssim
