"""Host input-pipeline measurement (VERDICT r1 weak #6 / next #9).

Measures batch-production time for the CIFAR-10-shaped train pipeline at
batch 128 (the full train-step consumer runs at ~73.5 ms/step, BASELINE.md)
and for the PDE/PINN pipeline at batch 64, serial vs thread-pool vs
prefetched.  CPU-only: run with JAX_PLATFORMS=cpu.
"""

import time

import numpy as np

try:  # keep this host-side script off the TPU (axon ignores JAX_PLATFORMS)
  import jax
  jax.config.update('jax_platforms', 'cpu')
except ImportError:
  pass

from b_pinn_kalman_filter_tpu import configs
from b_pinn_kalman_filter_tpu.data import datasets


def measure(loader, n_batches=40, warmup=4, consumer_ms=0.0):
  it = iter(loader)
  for _ in range(warmup):
    next(it)
  t0 = time.perf_counter()
  for _ in range(n_batches):
    next(it)
    if consumer_ms:
      time.sleep(consumer_ms / 1e3)  # emulate the device step
  dt = (time.perf_counter() - t0) / n_batches * 1e3
  return dt - consumer_ms


def main():
  config = configs.get_config('vp/cifar10_ddpmpp_continuous')
  train, _ = datasets.get_dataset(config)  # prefetched, num_workers=4
  base = train.loader  # unwrap PrefetchLoader
  serial = datasets.NumpyLoader(base.dataset, base.batch_size, seed=0)
  print(f'CIFAR10 batch={base.batch_size}')
  print(f'  serial:                 {measure(serial):7.2f} ms/batch')
  print(f'  workers=4:              {measure(base):7.2f} ms/batch')
  print(f'  prefetch (74ms consumer): {measure(train, consumer_ms=74):5.2f} ms/batch stall')

  pconfig = configs.get_config('pinn/pinn_pde')
  ptrain, _ = datasets.get_dataset(pconfig)
  pbase = ptrain.loader
  pserial = datasets.NumpyLoader(pbase.dataset, pbase.batch_size, seed=0)
  print(f'PDE batch={pbase.batch_size}')
  print(f'  serial:                 {measure(pserial):7.2f} ms/batch')
  print(f'  workers=4:              {measure(pbase):7.2f} ms/batch')
  print(f'  prefetch (74ms consumer): {measure(ptrain, consumer_ms=74):5.2f} ms/batch stall')


if __name__ == '__main__':
  main()
