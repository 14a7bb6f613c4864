"""Autoregressive simulators: PINN rollout + pure NS-stepper rollout
(reference: pinn_kalman/simulator.py).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from absl import logging

from b_pinn_kalman_filter_tpu.ops import ns_step
from b_pinn_kalman_filter_tpu.pinn.pinn import pinn_step

DT = 0.0005 * 5     # reference simulator.py:35
DX = 1.0 / 200      # reference simulator.py:36


def simulate(model, params, config, begin, t_range=(0, 100), stride=1):
  """Autoregressive PINN rollout: model -> advect -> feed back
  (reference simulate, simulator.py:6-30).

  ``begin``: (T, 6, H, W) ground-truth frames (coordx, coordy, f, u, v, p).
  """
  def prep(d):
    return jnp.asarray(d)[None, :, :, None]

  t0, tm = t_range
  f1 = prep(begin[t0, 2])
  f2 = prep(begin[t0 + 1, 2])
  x = prep(begin[t0, 0])
  y = prep(begin[t0, 1])

  result, vel = [], []
  size = (config.data.image_size, config.data.image_size)

  # One jitted program per frame (constant shapes -> single compile); an
  # eager model.apply here is per-primitive dispatch on the TPU tunnel.
  @jax.jit
  def one(f1, f2, tt):
    flow, _pres = model.apply({'params': params}, f1, f2, x, y, tt,
                              size=size, train=False)
    return pinn_step(f2, flow[-1], config.data.dt), flow[-1]

  for t in range(t0, tm, stride):
    f, fl = one(f1, f2, jnp.asarray([float(t)]))
    result.append(f)
    vel.append(fl)
    f1, f2 = f2, f

  return result, vel


def step_rollout(begin, t_range=(0, 100), stride=1, batch: int = 1):
  """Pure NS-stepper rollout (reference step, simulator.py:38-63).

  Returns (densities, velocities, pressures) lists.
  """
  t0, tm = t_range

  def prep(d):
    a = jnp.asarray(d)[None]
    return jnp.tile(a, (batch, 1, 1))

  f = prep(begin[t0, 2])
  u = prep(begin[t0, 3])
  v = prep(begin[t0, 4])
  p = prep(begin[t0, 5])

  result, vels, press = [], [], []
  step = jax.jit(lambda f, u, v, p: _one(f, u, v, p))

  def _one(f, u, v, p):
    from b_pinn_kalman_filter_tpu.ops.ns_step_pallas import ns_step_auto
    return ns_step_auto(f, u, v, p, DT, DX)

  for t in range(t0, tm, stride):
    f, u, v, p = step(f, u, v, p)
    result.append(f)
    vels.append((u, v))
    press.append(p)
  return result, vels, press


def run(config, ckptdir: Optional[str], workdir: str, n_steps: int = 100):
  """CLI 'simulate' mode: NS rollout vs ground truth, per-frame MSE
  (reference simulator.py __main__ :66-119)."""
  from b_pinn_kalman_filter_tpu.data.datasets import _cached_ns_rollout
  from b_pinn_kalman_filter_tpu.utils.misc import save_image_grid

  os.makedirs(workdir, exist_ok=True)
  size = config.data.image_size
  data = _cached_ns_rollout(max(n_steps + 2, 64), size, size, config.seed)

  result, vels, press = step_rollout(data, t_range=(0, n_steps))
  mses = []
  for i, f in enumerate(result):
    if i + 1 < len(data):
      mse = float(jnp.mean((f[0] - jnp.asarray(data[i + 1, 2])) ** 2))
      mses.append(mse)
  logging.info("simulate: %d steps, final f MSE vs gt: %.5e",
               n_steps, mses[-1] if mses else float('nan'))

  frames = np.stack([np.asarray(result[i][0]) for i in
                     range(0, len(result), max(1, len(result) // 10))])
  save_image_grid(np.clip(frames[..., None], 0, 1),
                  os.path.join(workdir, 'simulate.png'), nrow=len(frames))
  with open(os.path.join(workdir, 'simulate_mse.txt'), 'w') as fh:
    for m in mses:
      fh.write(f"{m}\n")
  return mses
