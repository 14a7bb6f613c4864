"""DPS inpainting on NC (reference: configs/inverse/nc_ddpmpp_inpaint_dps.py)."""

import ml_collections

from b_pinn_kalman_filter_tpu.configs.tpu_defaults import add_inverse_extensions
from b_pinn_kalman_filter_tpu.configs.vp import nc_ddpmpp


def get_config():
  config = nc_ddpmpp.get_config()
  config.training.batch_size = 16

  inverse = config.inverse = ml_collections.ConfigDict()
  inverse.operator = 'inpaint'
  inverse.invert = False
  inverse.ratio = 0.5
  inverse.sampler = 'dps'
  inverse.variance = 0.1
  inverse.solver = 'RK45'  # 'RK45', 'RK23', 'fixed'
  add_inverse_extensions(inverse)
  return config
