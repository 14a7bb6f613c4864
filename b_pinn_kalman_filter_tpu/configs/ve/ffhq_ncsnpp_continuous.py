"""NCSN++ on FFHQ 1024x1024, continuous VE
(reference: configs/ve/ffhq_ncsnpp_continuous.py; reduce_mean=True there,
unlike the CelebA-HQ twin)."""

from b_pinn_kalman_filter_tpu.configs.ve.celebahq_ncsnpp_continuous import _highres_1024


def get_config():
  return _highres_1024('FFHQ', reduce_mean=True)
