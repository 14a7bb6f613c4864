"""DPS random-mask inpainting on NC (reference: configs/inverse/nc_ddpmpp_rndinpaint_dps.py)."""

import ml_collections

from b_pinn_kalman_filter_tpu.configs.tpu_defaults import add_inverse_extensions
from b_pinn_kalman_filter_tpu.configs.vp import nc_ddpmpp


def get_config():
  config = nc_ddpmpp.get_config()
  config.training.batch_size = 64

  inverse = config.inverse = ml_collections.ConfigDict()
  inverse.operator = 'inpaint_rnd'
  inverse.invert = False
  inverse.ratio = 0.5
  inverse.sampler = 'dps'
  inverse.variance = 0.1
  inverse.solver = 'RK45'
  add_inverse_extensions(inverse)
  return config
