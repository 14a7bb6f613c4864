"""NCSN++ on CelebA-HQ 256x256, continuous VE
(reference: configs/ve/celebahq_256_ncsnpp_continuous.py)."""

from b_pinn_kalman_filter_tpu.configs._blocks import ncsnpp_highres_model
from b_pinn_kalman_filter_tpu.configs.default_lsun_configs import get_default_configs


def get_config():
  config = get_default_configs()
  training = config.training
  training.sde = 'vesde'
  training.continuous = True

  sampling = config.sampling
  sampling.method = 'pc'
  sampling.predictor = 'reverse_diffusion'
  sampling.corrector = 'langevin'

  data = config.data
  data.dataset = 'CelebAHQ'
  data.image_size = 256

  ncsnpp_highres_model(config.model)
  config.model.sigma_max = 348
  # 256² + N=2000 single-dispatch PC holds the device ~4 min — the crash
  # pattern of BASELINE.md's NC row; chip-validated chunking
  # (chip_logs/hr256.log ran exactly this: pc_chunks=40).
  config.sampling.pc_chunks = 40
  return config
