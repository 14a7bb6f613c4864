"""Deep-config train-step timing with tpu.remat on/off (VERDICT r1 #4).

vp/cifar10_ddpmpp_deep_continuous (8 res blocks, 107M params) train step at
the reference batch 128: does it compile + fit HBM, and what does remat cost?

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/deep_remat_bench.py
"""

import json
import time

import jax
import numpy as np


def run(remat: bool, n_steps: int = 10):
  from b_pinn_kalman_filter_tpu import configs, models as mutils
  from b_pinn_kalman_filter_tpu.core import losses, sde as sde_lib
  from b_pinn_kalman_filter_tpu.train import state as state_lib

  config = configs.get_config('vp/cifar10_ddpmpp_deep_continuous')
  config.tpu.remat = remat
  batch = config.training.batch_size
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

  def host_batch(i):
    rng = np.random.default_rng(int(time.time_ns()) % 2 ** 31 + i)
    return jax.numpy.asarray(
        rng.standard_normal(shape, np.float32) * 0.5)

  t0 = time.perf_counter()
  state, loss = step_fn(fresh_key(), state, host_batch(0))
  np.asarray(loss)
  compile_s = time.perf_counter() - t0

  t0 = time.perf_counter()
  for i in range(n_steps):
    state, loss = step_fn(fresh_key(), state, host_batch(i))
  lv = float(np.asarray(loss))
  dt = (time.perf_counter() - t0) / n_steps
  print(json.dumps({
      'config': 'vp/cifar10_ddpmpp_deep_continuous', 'remat': remat,
      'params_M': round(n_params / 1e6, 1), 'batch': batch,
      'ms_per_step': round(dt * 1e3, 1),
      'imgs_per_sec': round(batch / dt, 1),
      'compile_s': round(compile_s, 1), 'loss': round(lv, 4)}), flush=True)


if __name__ == '__main__':
  dev = jax.devices()[0]
  print(f'device: {dev.platform} {dev.device_kind}', flush=True)
  for remat in (False, True):
    try:
      run(remat)
    except Exception as e:
      print(json.dumps({'remat': remat,
                        'error': f'{type(e).__name__}: {e}'[:300]}),
            flush=True)
