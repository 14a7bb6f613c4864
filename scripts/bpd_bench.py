"""Probability-flow-ODE likelihood (bits/dim) throughput on the real TPU
(BASELINE.md "to be measured" item 3: VE NCSN++ CIFAR-10 bpd).

Times the full on-device Dormand-Prince + Hutchinson trace estimator
(core/likelihood.py) on the VE NCSN++ continuous config.  bpd *values*
from an untrained net are meaningless; the deliverable is the wall-clock
per image for the full adaptive integration and that the program is a
single XLA computation (no host round-trips per RHS eval — the reference
pays scipy solve_ivp callbacks, reference likelihood.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bpd_bench.py
"""

import json
import time

import jax
import numpy as np


def main():
  from b_pinn_kalman_filter_tpu import configs, models as mutils
  from b_pinn_kalman_filter_tpu.core import likelihood, sde as sde_lib
  from b_pinn_kalman_filter_tpu.data import (get_data_inverse_scaler,
                                             get_data_scaler)

  dev = jax.devices()[0]
  print(f'device: {dev.platform} {dev.device_kind}', flush=True)

  config = configs.get_config('ve/cifar10_ncsnpp_continuous')
  batch = 16
  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  params = variables['params']
  sde, _ = sde_lib.get_sde(config)
  lik_fn = jax.jit(likelihood.get_likelihood_fn(
      sde, model, get_data_inverse_scaler(config)))

  scaler = get_data_scaler(config)
  def fresh_batch(i):
    rng = np.random.default_rng(int(time.time_ns()) % 2 ** 31 + i)
    return jax.numpy.asarray(scaler(
        rng.random((batch, 32, 32, 3)).astype(np.float32)))

  t0 = time.perf_counter()
  bpd, z, nfe = lik_fn(jax.random.PRNGKey(1), params, fresh_batch(0))
  np.asarray(bpd)
  compile_s = time.perf_counter() - t0

  times, nfes = [], []
  for i in range(3):
    x = fresh_batch(i + 1)
    t0 = time.perf_counter()
    bpd, z, nfe = lik_fn(jax.random.PRNGKey(i + 2), params, x)
    b = np.asarray(bpd)
    times.append(time.perf_counter() - t0)
    nfes.append(int(np.asarray(nfe)))
  dt = min(times)
  print(json.dumps({
      'config': 've/cifar10_ncsnpp_continuous', 'batch': batch,
      'sec_per_batch': round(dt, 2),
      'imgs_per_sec': round(batch / dt, 2),
      'nfe': nfes, 'bpd_finite': bool(np.isfinite(b).all()),
      'compile_s': round(compile_s, 1)}), flush=True)


if __name__ == '__main__':
  main()
