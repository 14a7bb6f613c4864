"""High-resolution (256²) sampling throughput on the real chip.

Covers the reference's VE CelebA-HQ/church 256² NCSN++ family
(reference configs/ve/celebahq_256_ncsnpp_continuous.py, N=2000): the
largest sampling program in the config tree.  A single N=2000 reverse
scan at 256² holds the device for minutes in one dispatch — exactly the
pattern that crashed the tunnel worker on the NC run (chip_logs) — so
this uses `sampling.pc_chunks` (core/sampling.get_pc_chunked_sampler),
which is bit-identical to the single-scan sampler but dispatches in
bounded segments.

Honest-timing rules (CLAUDE.md): fresh time-derived keys per run + full
host readback per measurement.

Stages: PC (exact reference semantics) first, then the beyond-parity
DPM-Solver++ ~20-NFE number on the same model.
"""
import os
import time

import jax
import numpy as np

from b_pinn_kalman_filter_tpu import configs
from b_pinn_kalman_filter_tpu import models as mutils
from b_pinn_kalman_filter_tpu.core import sampling, sde as sde_lib
from b_pinn_kalman_filter_tpu.data import get_data_inverse_scaler

config = configs.get_config("ve/celebahq_256_ncsnpp_continuous")
batch = int(os.environ.get("HR_BATCH", "4"))
config.sampling.pc_chunks = int(os.environ.get("HR_CHUNKS", "40"))
print("devices:", jax.devices(), "image", config.data.image_size,
      "N", config.model.num_scales, "batch", batch,
      "pc_chunks", config.sampling.pc_chunks, flush=True)

model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
params = variables['params']
n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
print(f"params: {n_params/1e6:.1f}M", flush=True)
sde, eps = sde_lib.get_sde(config)
shape = (batch, config.data.image_size, config.data.image_size,
         config.data.num_channels)
inverse_scaler = get_data_inverse_scaler(config)


def fresh_key():
  return jax.random.PRNGKey(int(time.time_ns()) % 2 ** 31)


def measure(fn, label, runs=2):
  t0 = time.time()
  samples, nfe = fn(fresh_key(), params)
  samples = np.asarray(samples)
  print(f"[{label}] first call (incl. compile): {time.time()-t0:.0f}s, "
        f"nfe={int(nfe)}", flush=True)
  assert np.isfinite(samples).all()
  times = []
  for i in range(runs):
    t0 = time.time()
    samples, _ = fn(fresh_key(), params)
    samples = np.asarray(samples)
    times.append(time.time() - t0)
    print(f"[{label}] run {i}: {times[-1]:.1f}s -> "
          f"{batch/times[-1]:.4f} imgs/sec", flush=True)
  dt = min(times)
  print(f"HR256_{label}_CHIP_OK {batch/dt:.4f} imgs/sec/chip "
        f"(256^2x{config.data.num_channels}, batch {batch}, "
        f"{dt:.1f}s/batch)", flush=True)


# PC, exact reference semantics (N=2000, chunked dispatch, same program).
pc_fn = sampling.get_sampling_fn(config, sde, model, shape, inverse_scaler,
                                 eps)
measure(pc_fn, "PC")

# Beyond-parity: DPM-Solver++ ~20 NFE on the same model.
config.sampling.method = 'dpm_solver'
dpm_fn = jax.jit(sampling.get_sampling_fn(config, sde, model, shape,
                                          inverse_scaler, eps))
measure(dpm_fn, "DPM", runs=3)
