"""LiteFlowNet-PINN on Navier-Stokes PDE data
(reference: configs/pinn/pinn_pde_lfn.py)."""

import ml_collections

from b_pinn_kalman_filter_tpu.configs.pinn.pinn_default_configs import get_default_configs


def get_config():
  config = get_default_configs()

  data = config.data
  data.dataset = 'PDE'
  data.dt = 1.75
  data.time_trim = 0

  config.model.arch = 'liteflownet'

  # inverse/kf blocks as in pinn_pde.py (the reference's lfn config omits
  # them; the drivers need them for masked prelim training and --mode ukf).
  inverse = config.inverse = ml_collections.ConfigDict()
  inverse.operator = 'inpaint_rnd'
  inverse.invert = False
  inverse.ratio = 0.9
  inverse.variance = 0.01

  kf = config.kf = ml_collections.ConfigDict()
  kf.patch_size = 8
  return config
