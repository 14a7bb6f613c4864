"""Discrete DDPM on CelebA-HQ 256 (reference: configs/vp/ddpm/celebahq.py)."""

from b_pinn_kalman_filter_tpu.configs._blocks import ddpm_highres_model
from b_pinn_kalman_filter_tpu.configs.default_lsun_configs import get_default_configs


def get_config():
  config = get_default_configs()
  training = config.training
  training.sde = 'vpsde'
  training.continuous = False
  training.reduce_mean = True

  sampling = config.sampling
  sampling.method = 'pc'
  sampling.predictor = 'ancestral_sampling'
  sampling.corrector = 'none'

  data = config.data
  data.dataset = 'CelebAHQ'
  data.centered = True
  data.image_size = 256

  ddpm_highres_model(config.model)
  config.optim.lr = 2e-5
  return config
