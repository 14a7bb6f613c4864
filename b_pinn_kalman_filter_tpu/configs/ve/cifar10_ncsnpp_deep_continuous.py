"""VE NCSN++ deep on CIFAR-10, continuous (reference: configs/ve/cifar10_ncsnpp_deep_continuous.py)."""

from b_pinn_kalman_filter_tpu.configs.ve.cifar10_ncsnpp_continuous import get_config as base


def get_config():
  config = base()
  config.training.n_iters = 950001
  config.model.num_res_blocks = 8
  config.model.fourier_scale = 16
  return config
