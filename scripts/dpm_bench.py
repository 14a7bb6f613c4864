"""DPM-Solver++ sampling throughput on the real chip (beyond-parity row).

Same program shape as bench.py's headline (full 57.6M DDPM++ at 32^2,
batch 64, bf16) but sampling with the 2nd-order multistep solver at ~20
NFE instead of the reference's N=1000 PC loop.  Timing discipline per
CLAUDE.md: fresh keys + full host readback per measurement.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dpm_bench.py
"""

import time

import jax
import numpy as np

from b_pinn_kalman_filter_tpu import configs, models as mutils
from b_pinn_kalman_filter_tpu.core import sampling, sde as sde_lib
from b_pinn_kalman_filter_tpu.data import get_data_inverse_scaler


def _fresh_key():
  return jax.random.PRNGKey(int(time.time_ns()) % 2 ** 31)


def main():
  config = configs.get_config("vp/cifar10_ddpmpp_continuous")
  batch = 64
  print("devices:", jax.devices(), flush=True)

  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  params = variables['params']
  sde, eps = sde_lib.get_sde(config)
  shape = (batch, config.data.image_size, config.data.image_size,
           config.data.num_channels)

  for steps in (10, 20, 50):
    fn = jax.jit(sampling.get_dpm_solver_sampler(
        sde, model, shape, get_data_inverse_scaler(config), steps=steps,
        order=2, continuous=config.training.continuous, denoise=True,
        eps=eps))
    samples, nfe = fn(_fresh_key(), params)
    np.asarray(samples)  # compile + warmup
    times = []
    for _ in range(5):
      t0 = time.perf_counter()
      samples, nfe = fn(_fresh_key(), params)
      np.asarray(samples)
      times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"DPM_BENCH steps={steps} nfe={int(nfe)}: {batch/dt:.1f} imgs/sec "
          f"({dt*1e3:.0f} ms/batch-{batch}; PC N=1000 reference point: "
          f"7.8 imgs/sec)", flush=True)


if __name__ == '__main__':
  main()
