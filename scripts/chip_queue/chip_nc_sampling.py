"""PC sampling throughput on the reference's second flagship task: the NC
(netCDF climate/PDE) VP DDPM++ config at 64^2, N=2000 reverse steps
(reference configs/default_nc_configs.py: model.num_scales=2000).

Complements the CIFAR-10 headline (32^2, N=1000) with the other config
family's sampling cost.  Honest-timing rules (CLAUDE.md): fresh keys per
run + full host readback.
"""
import os
import time

import jax
import numpy as np

from b_pinn_kalman_filter_tpu import configs
from b_pinn_kalman_filter_tpu import models as mutils
from b_pinn_kalman_filter_tpu.core import sampling, sde as sde_lib
from b_pinn_kalman_filter_tpu.data import get_data_inverse_scaler

config = configs.get_config("vp/nc_ddpmpp")
# batch 64 made one N=2000 reverse scan a single ~70 s device dispatch and
# crashed the tunnel worker (2026-08-19); batch 16 keeps dispatches short.
batch = int(os.environ.get("NC_BATCH", "16"))
print("devices:", jax.devices(), "image", config.data.image_size,
      "channels", config.data.num_channels, "N", config.model.num_scales,
      flush=True)

model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
params = variables['params']
n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
print(f"params: {n_params/1e6:.1f}M", flush=True)
sde, eps = sde_lib.get_sde(config)
shape = (batch, config.data.image_size, config.data.image_size,
         config.data.num_channels)
fn = jax.jit(sampling.get_sampling_fn(
    config, sde, model, shape, get_data_inverse_scaler(config), eps))


def fresh_key():
  return jax.random.PRNGKey(int(time.time_ns()) % 2 ** 31)

t0 = time.time()
samples, nfe = fn(fresh_key(), params)
samples = np.asarray(samples)
print(f"first call (incl. compile): {time.time()-t0:.0f}s, nfe={int(nfe)}",
      flush=True)
assert np.isfinite(samples).all()

times = []
for i in range(3):
  t0 = time.time()
  samples, _ = fn(fresh_key(), params)
  samples = np.asarray(samples)
  times.append(time.time() - t0)
  print(f"run {i}: {times[-1]:.1f}s -> {batch/times[-1]:.2f} imgs/sec",
        flush=True)

dt = min(times)
print(f"NC_SAMPLING_CHIP_OK {batch/dt:.2f} imgs/sec/chip "
      f"(64^2x{config.data.num_channels}, N={config.model.num_scales}, "
      f"batch {batch}, {dt:.1f}s/batch)", flush=True)
