"""VP DDPM++ on NC chlorophyll data (reference: configs/vp/nc_chl_ddpmpp.py)."""

from b_pinn_kalman_filter_tpu.configs.vp.nc_ddpmpp import get_config as base


def get_config():
  config = base()
  data = config.data
  data.category = 'Chl'
  data.key = 'BLGCHL'
  data.date_range = '2013to2017_5day'
  return config
