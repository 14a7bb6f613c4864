"""sub-VP NCSN++ deep, continuous (reference: configs/subvp/cifar10_ncsnpp_deep_continuous.py)."""

from b_pinn_kalman_filter_tpu.configs.subvp.cifar10_ncsnpp_continuous import get_config as base


def get_config():
  config = base()
  config.training.n_iters = 950001
  config.model.num_res_blocks = 8
  return config
