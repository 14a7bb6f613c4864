"""Tiny configs for fast CPU tests."""

import ml_collections

from b_pinn_kalman_filter_tpu.configs.vp import cifar10_ddpmpp_continuous
from b_pinn_kalman_filter_tpu.configs.ve import cifar10_ncsnpp_continuous


def tiny_ddpm_config():
  config = cifar10_ddpmpp_continuous.get_config()
  config.data.image_size = 8
  config.data.num_channels = 1
  config.training.batch_size = 8
  config.eval.batch_size = 8
  config.model.nf = 8
  config.model.ch_mult = (1, 2)
  config.model.num_res_blocks = 1
  config.model.attn_resolutions = (4,)
  config.model.num_scales = 20
  config.optim.warmup = 2
  return config


def tiny_mlp_config():
  config = tiny_ddpm_config()
  config.model.name = 'mlp'
  config.model.scale_by_sigma = False
  return config


def tiny_ncsnpp_config():
  config = cifar10_ncsnpp_continuous.get_config()
  config.data.image_size = 16
  config.data.num_channels = 1
  config.training.batch_size = 4
  config.eval.batch_size = 4
  config.model.nf = 8
  config.model.ch_mult = (1, 2)
  config.model.num_res_blocks = 1
  config.model.attn_resolutions = (8,)
  config.model.num_scales = 20
  config.optim.warmup = 2
  return config
