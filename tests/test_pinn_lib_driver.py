"""End-to-end PINN driver tests (SURVEY P21, reference pinn_lib.py:26-258):
the two-phase `train` and the MOPED-bootstrapped `train_bpinn`, through the
real dataset/mask/checkpoint plumbing on the 8-device virtual mesh — the
step functions themselves are unit-tested in test_pinn.py; these cover the
driver loop (cadence, checkpoint layout, resume, phase hand-off)."""

import os

import jax
import numpy as np

from b_pinn_kalman_filter_tpu.configs.pinn.pinn_pde import get_config as pde_config


def _fast_pinn_config():
  config = pde_config()
  config.data.image_size = 16
  config.model.feature_nums = [4, 8]   # 2-level pyramid fits 16x16
  config.training.batch_size = 8       # divisible by the 8-device mesh
  config.optim.warmup = 2
  config.training.n_iters = 2
  config.training.n_pinn_iters = 2
  config.training.n_bpinn_iters = 2
  config.training.snapshot_freq = 2
  config.training.snapshot_freq_for_preemption = 2
  config.training.log_freq = 1
  config.training.eval_freq = 2
  return config


def test_pinn_train_two_phases_then_bpinn(tmp_path):
  from b_pinn_kalman_filter_tpu.pinn import pinn_lib

  config = _fast_pinn_config()
  workdir = str(tmp_path / "pinn_run")
  state2 = pinn_lib.train(config, workdir)

  # Phase 2 ran through n_iters + n_pinn_iters (loop is start..end inclusive).
  final_step = int(np.asarray(jax.device_get(state2).step))
  assert final_step == config.training.n_iters + config.training.n_pinn_iters + 1

  # Checkpoint layout matches the reference's split (pinn_lib.py:124):
  # shared numbered dir, separate phase-1 / phase-2 meta checkpoints.
  ckpt_1 = os.path.join(workdir, "checkpoints", "checkpoint_1")
  ckpt_2 = os.path.join(workdir, "checkpoints", "checkpoint_2")
  meta = os.path.join(workdir, "checkpoints-meta", "checkpoint")
  meta_pinn = os.path.join(workdir, "checkpoints-meta", "checkpoint_pinn")
  assert os.path.exists(ckpt_1)   # phase-1 end snapshot (step 2 / freq 2)
  assert os.path.exists(ckpt_2)   # phase-2 end snapshot (step 4 / freq 2)
  assert os.path.exists(meta)
  assert os.path.exists(meta_pinn)

  for leaf in jax.tree_util.tree_leaves(jax.device_get(state2).params):
    assert np.isfinite(np.asarray(leaf)).all()

  # Resume: a second call restores both phase metas and completes without
  # restarting from 0 (phase-1 meta holds step 2 -> at most one extra step).
  state_resumed = pinn_lib.train(config, workdir)
  assert int(np.asarray(jax.device_get(state_resumed).step)) == final_step

  # B-PINN: MOPED warm start from the phase-2 snapshot
  # (reference utils.restore_bpinn_checkpoint, utils.py:62-92).
  bworkdir = str(tmp_path / "bpinn_run")
  bstate = pinn_lib.train_bpinn(config, bworkdir, ckpt_2)
  bparams = jax.device_get(bstate).params
  flat = {jax.tree_util.keystr(path): leaf for path, leaf
          in jax.tree_util.tree_leaves_with_path(bparams)}
  # Posterior params carry the Gaussian reparameterization (mu + rho).
  assert any('rho' in k for k in flat), sorted(flat)[:8]
  for leaf in flat.values():
    assert np.isfinite(np.asarray(leaf)).all()
  assert os.path.exists(os.path.join(bworkdir, "checkpoints-meta",
                                     "checkpoint"))
