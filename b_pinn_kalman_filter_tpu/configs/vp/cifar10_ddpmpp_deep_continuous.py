"""VP DDPM++ deep on CIFAR-10, continuous (reference: configs/vp/cifar10_ddpmpp_deep_continuous.py)."""

from b_pinn_kalman_filter_tpu.configs.vp.cifar10_ddpmpp_continuous import get_config as base


def get_config():
  config = base()
  config.training.n_iters = 950001
  config.model.num_res_blocks = 8
  return config
