"""sub-VP DDPM, continuous (reference: configs/subvp/cifar10_ddpm_continuous.py)."""

from b_pinn_kalman_filter_tpu.configs.vp.ddpm.cifar10 import get_config as base


def get_config():
  config = base()
  config.training.sde = 'subvpsde'
  config.training.continuous = True
  config.sampling.predictor = 'euler_maruyama'
  return config
