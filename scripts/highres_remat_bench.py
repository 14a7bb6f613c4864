"""256^2 NCSN++ train-step HBM feasibility with tpu.remat (the config the
remat knob exists for: ve/celebahq_256_ncsnpp_continuous, batch 64).

Compiles + runs one step per remat setting; an HBM OOM at compile is
caught and reported as the result.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/highres_remat_bench.py [batch]
"""

import json
import sys
import time

import jax
import numpy as np


def run(remat: bool, batch: int):
  from b_pinn_kalman_filter_tpu import configs, models as mutils
  from b_pinn_kalman_filter_tpu.core import losses, sde as sde_lib
  from b_pinn_kalman_filter_tpu.train import state as state_lib

  config = configs.get_config('ve/celebahq_256_ncsnpp_continuous')
  config.tpu.remat = remat
  config.training.batch_size = batch
  shape = (batch, config.data.image_size, config.data.image_size,
           config.data.num_channels)

  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  n_params = sum(p.size for p in jax.tree_util.tree_leaves(variables['params']))
  tx = losses.get_optimizer(config)
  state = state_lib.create_train_state(variables['params'], tx,
                                       config.model.ema_rate)
  sde, _ = sde_lib.get_sde(config)
  step_fn = jax.jit(
      losses.get_step_fn(sde, model, tx, train=True,
                         reduce_mean=config.training.reduce_mean,
                         continuous=config.training.continuous),
      donate_argnums=(1,))

  def fresh_key():
    return jax.random.PRNGKey(int(time.time_ns()) % 2 ** 31)

  x = jax.numpy.asarray(
      np.random.default_rng(0).standard_normal(shape, np.float32))
  t0 = time.perf_counter()
  state, loss = step_fn(fresh_key(), state, x)
  np.asarray(loss)
  compile_s = time.perf_counter() - t0
  times = []
  for i in range(3):
    x = jax.numpy.asarray(
        np.random.default_rng(i + 1).standard_normal(shape, np.float32))
    t0 = time.perf_counter()
    state, loss = step_fn(fresh_key(), state, x)
    lv = float(np.asarray(loss))
    times.append(time.perf_counter() - t0)
  dt = min(times)
  print(json.dumps({
      'config': 've/celebahq_256_ncsnpp_continuous', 'remat': remat,
      'params_M': round(n_params / 1e6, 1), 'batch': batch,
      'ms_per_step': round(dt * 1e3, 1),
      'imgs_per_sec': round(batch / dt, 1),
      'compile_s': round(compile_s, 1), 'loss_finite': lv == lv}),
      flush=True)


if __name__ == '__main__':
  batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
  dev = jax.devices()[0]
  print(f'device: {dev.platform} {dev.device_kind} batch={batch}', flush=True)
  for remat in (True, False):
    try:
      run(remat, batch)
    except Exception as e:
      msg = f'{type(e).__name__}: {e}'
      if 'Ran out of memory' in msg:
        import re
        m = re.search(r'Used ([0-9.]+[GM]) of ([0-9.]+[GM])', msg)
        msg = f'HBM OOM ({m.group(0) if m else "see log"})'
      print(json.dumps({'remat': remat, 'error': msg[:300]}), flush=True)
