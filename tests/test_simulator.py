"""Simulator tests (SURVEY P24, reference pinn_kalman/simulator.py):
the autoregressive PINN rollout, the pure NS-stepper rollout, and the CLI
`--mode simulate` driver's MSE-vs-ground-truth loop."""

import os

import jax
import numpy as np

from b_pinn_kalman_filter_tpu.configs.pinn.pinn_pde import get_config as pde_config
from b_pinn_kalman_filter_tpu.data.datasets import _cached_ns_rollout
from b_pinn_kalman_filter_tpu.kalman import simulator


def _tiny_config():
  config = pde_config()
  config.data.image_size = 16
  config.model.feature_nums = [4, 8]
  config.training.batch_size = 2
  return config


def test_pinn_rollout_autoregressive(tmp_path, monkeypatch):
  """`simulate` (reference simulator.py:6-30): model -> advect -> feed back.
  Frames stay finite and each output is the advected previous frame, so
  consecutive outputs must differ (the rollout is not a fixed point)."""
  monkeypatch.setenv('BPKF_DATA_DIR', str(tmp_path))
  config = _tiny_config()
  size = config.data.image_size
  data = _cached_ns_rollout(8, size, size, config.seed)

  from b_pinn_kalman_filter_tpu.pinn.pinn_lib import init_pinn
  model, variables = init_pinn(config, jax.random.PRNGKey(0))

  n = 4
  result, vel = simulator.simulate(model, variables['params'], config,
                                   data, t_range=(0, n))
  assert len(result) == n and len(vel) == n
  for f, fl in zip(result, vel):
    assert f.shape == (1, size, size, 1)
    assert fl.shape == (1, size, size, 2)
    assert np.isfinite(np.asarray(f)).all()
    assert np.isfinite(np.asarray(fl)).all()
  assert not np.allclose(np.asarray(result[0]), np.asarray(result[-1]))


def test_step_rollout_tracks_ground_truth(tmp_path, monkeypatch):
  """`step_rollout` (reference simulator.py:38-63) uses the same NS stepper
  that generated the cached ground-truth frames, so a short rollout from
  frame 0 must track the stored trajectory closely."""
  monkeypatch.setenv('BPKF_DATA_DIR', str(tmp_path))
  size = 16
  data = _cached_ns_rollout(8, size, size, 42)
  n = 4
  result, vels, press = simulator.step_rollout(data, t_range=(0, n))
  assert len(result) == len(vels) == len(press) == n
  for f, (u, v), p in zip(result, vels, press):
    assert f.shape == u.shape == v.shape == p.shape == (1, size, size)
    for a in (f, u, v, p):
      assert np.isfinite(np.asarray(a)).all()


def test_simulate_mode_driver(tmp_path, monkeypatch):
  """CLI `--mode simulate` body (reference simulator.py __main__ :66-119):
  per-frame MSE list written, PNG artifact saved."""
  monkeypatch.setenv('BPKF_DATA_DIR', str(tmp_path / 'data'))
  config = _tiny_config()
  workdir = str(tmp_path / 'sim')
  mses = simulator.run(config, None, workdir, n_steps=4)
  assert len(mses) == 4
  assert all(np.isfinite(m) for m in mses)
  assert os.path.exists(os.path.join(workdir, 'simulate.png'))
  assert os.path.exists(os.path.join(workdir, 'simulate_mse.txt'))
