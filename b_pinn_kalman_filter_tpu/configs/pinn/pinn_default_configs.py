"""Default PINN config (reference: configs/pinn/pinn_default_configs.py)."""

import ml_collections

from b_pinn_kalman_filter_tpu.configs.tpu_defaults import add_tpu_defaults


def get_default_configs():
  config = ml_collections.ConfigDict()
  # training
  config.training = training = ml_collections.ConfigDict()
  config.training.batch_size = 64
  training.n_iters = 35000
  training.n_pinn_iters = 25000
  training.n_bpinn_iters = 40000
  training.snapshot_freq = 5000
  training.snapshot_freq_for_preemption = 250
  training.log_freq = 5
  training.eval_freq = 50
  training.pinn_loss_weight = 1e-5

  # data
  config.data = data = ml_collections.ConfigDict()
  data.num_channels = 1
  data.dataset = '_'
  data.image_size = 64
  data.random_flip = False
  data.uniform_dequantization = False
  data.centered = False

  # model
  config.model = model = ml_collections.ConfigDict()
  model.ema_rate = 0.9
  model.arch = 'flownet'
  # Tuple rather than the reference's list (same values, reference
  # pinn_default_configs.py:35): ml_collections only supports CLI overrides
  # for tuple-typed fields, and list assignments still coerce to tuple.
  model.feature_nums = (16, 32, 64, 96, 128)
  model.spatial_embed_omega = 100
  model.spatial_embed_s_flow = 100
  model.spatial_embed_s_pres = 100
  model.bpinn_moped_delta = 0.01

  # optimization
  config.optim = optim = ml_collections.ConfigDict()
  optim.weight_decay = 0
  optim.bpinn_weight_decay = 0
  optim.optimizer = 'Adam'
  optim.lr = 0.001
  optim.bpinn_lr = 0.0005
  optim.beta1 = 0.9
  optim.eps = 1e-8
  optim.warmup = 100
  optim.grad_clip = 1.

  config.seed = 42
  return add_tpu_defaults(config)
