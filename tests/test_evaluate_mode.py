"""run_lib.evaluate: loss / bpd / sample-dump paths on a tiny model."""

import os

import numpy as np

from tests.tiny_configs import tiny_mlp_config


def test_evaluate_loss_bpd_sampling(tmp_path):
  from b_pinn_kalman_filter_tpu.train import run_lib

  config = tiny_mlp_config()
  config.training.n_iters = 2
  config.training.snapshot_freq = 2
  config.training.snapshot_freq_for_preemption = 100
  config.training.eval_freq = 1
  config.training.log_freq = 1
  config.training.snapshot_sampling = False
  config.model.num_scales = 5
  config.sampling.method = 'pc'
  config.sampling.predictor = 'euler_maruyama'
  config.sampling.corrector = 'none'

  workdir = str(tmp_path / "run")
  run_lib.train(config, workdir)
  assert os.path.exists(os.path.join(workdir, "checkpoints", "checkpoint_1"))

  config.eval.begin_ckpt = 1
  config.eval.end_ckpt = 1
  config.eval.batch_size = 8
  config.eval.enable_loss = True
  config.eval.enable_bpd = True
  config.eval.bpd_dataset = 'train'  # single repeat
  config.eval.enable_sampling = True
  config.eval.num_samples = 8

  results = run_lib.evaluate(config, workdir)
  assert np.isfinite(results['ckpt_1_loss'])
  assert np.isfinite(results['ckpt_1_bpd'])
  eval_dir = os.path.join(workdir, "eval")
  assert os.path.exists(os.path.join(eval_dir, "ckpt_1_loss.npz"))
  assert os.path.exists(os.path.join(eval_dir, "test_ckpt_1_bpd.npz")) or \
      os.path.exists(os.path.join(eval_dir, "train_ckpt_1_bpd.npz"))
  assert os.path.exists(os.path.join(eval_dir, "ckpt_1", "samples_0.npz"))
