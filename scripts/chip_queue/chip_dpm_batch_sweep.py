"""DPM-Solver++ sampler throughput vs batch size on the real chip.

The beyond-parity fast-sampler number (bench.py bench_dpm) uses batch 64 —
the same batch as the reference-semantics PC headline, for comparability.
At ~20 NFE the per-dispatch overhead and tail effects weigh more than in a
1000-step scan, so serving-style larger batches may raise imgs/sec/chip.
One compile per batch size (server-side, minutes each); honest-timing
rules per CLAUDE.md (fresh keys + full readback, min over runs).
"""
import os
import time

import jax
import numpy as np

from b_pinn_kalman_filter_tpu import configs
from b_pinn_kalman_filter_tpu import models as mutils
from b_pinn_kalman_filter_tpu.core import sampling, sde as sde_lib
from b_pinn_kalman_filter_tpu.data import get_data_inverse_scaler

BATCHES = [int(b) for b in os.environ.get('DPM_BATCHES', '128,256').split(',')]

config = configs.get_config("vp/cifar10_ddpmpp_continuous")
model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
params = variables['params']
sde, eps = sde_lib.get_sde(config)
inverse_scaler = get_data_inverse_scaler(config)
print("devices:", jax.devices(), "batches:", BATCHES, flush=True)


def fresh_key():
  return jax.random.PRNGKey(int(time.time_ns()) % 2 ** 31)


for batch in BATCHES:
  shape = (batch, config.data.image_size, config.data.image_size,
           config.data.num_channels)
  fn = jax.jit(sampling.get_dpm_solver_sampler(
      sde, model, shape, inverse_scaler, steps=20, order=2,
      continuous=config.training.continuous, denoise=True, eps=eps))
  t0 = time.time()
  samples, _ = fn(fresh_key(), params)
  samples = np.asarray(samples)
  assert np.isfinite(samples).all()
  print(f"[b{batch}] first call (incl. compile): {time.time()-t0:.0f}s",
        flush=True)
  times = []
  for i in range(4):
    t0 = time.perf_counter()
    samples, _ = fn(fresh_key(), params)
    np.asarray(samples)
    times.append(time.perf_counter() - t0)
    print(f"[b{batch}] run {i}: {times[-1]:.3f}s -> "
          f"{batch/times[-1]:.1f} imgs/sec", flush=True)
  dt = min(times)
  per_chip = batch / dt / jax.device_count()   # mirrors bench_dpm's metric
  print(f"DPM_SWEEP_OK batch={batch} {per_chip:.1f} imgs/sec/chip "
        f"({dt:.3f}s/batch, 20 NFE, {jax.device_count()} device(s))",
        flush=True)
