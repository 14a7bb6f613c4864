"""Measure the microbatched fused PINN phase-2 schedule on the real chip
(VERDICT r2 Next #1).

Round 2 established: the literal nested-grad step runs 0.445 s at the
reference scale (64^2, batch 64, f32) = 589k residual pts/sec = 0.59x the
recalibrated A100 baseline, and the exact pass-count reductions OOM HBM
full-batch (47.7G vs 15.75G).  This script times the microbatched
gradient-accumulation schedule (``config.tpu.pinn_microbatch = C``) that
bounds the live derivative graph to one chunk — exactness proven in
tests/test_pinn_residual_parity.py::test_microbatched_pinn_step_matches_full.

Usage: python scripts/pinn_microbatch_bench.py [--microbatch 16] [--steps 8]

Timing discipline (CLAUDE.md): fresh time-derived inputs per run + full
host readback.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--microbatch', type=int, default=16)
  ap.add_argument('--steps', type=int, default=8)
  args = ap.parse_args()

  from b_pinn_kalman_filter_tpu import configs
  from b_pinn_kalman_filter_tpu.data import get_mask_dataset
  from b_pinn_kalman_filter_tpu.pinn import losses as pinn_losses
  from b_pinn_kalman_filter_tpu.pinn import pinn_lib
  from b_pinn_kalman_filter_tpu.train import state as state_lib

  print(f'backend: {jax.default_backend()} {jax.devices()}', flush=True)

  config = configs.get_config('pinn/pinn_pde')
  config.tpu.pinn_microbatch = args.microbatch
  B = config.training.batch_size
  H = config.data.image_size
  C = config.data.num_channels
  print(f'scale: batch {B} at {H}^2, microbatch {args.microbatch}',
        flush=True)

  t0 = time.perf_counter()
  model, variables = pinn_lib.init_pinn(config, jax.random.PRNGKey(0))
  tx = pinn_losses.get_pinn_optimizer(config, lr_mul_pres=0.005)
  state = state_lib.create_train_state(variables['params'], tx,
                                       config.model.ema_rate)
  print(f'init: {time.perf_counter() - t0:.1f}s', flush=True)

  step_fn = jax.jit(
      pinn_losses.get_pinn_step_fn(config, model, tx, train=True),
      donate_argnums=(1,))
  mask = jnp.asarray(get_mask_dataset(config).next())

  def host_batch(i):
    rng = np.random.default_rng(int(time.time_ns()) % 2 ** 31 + i)
    f = rng.standard_normal((B, H, H, C)).astype(np.float32)
    f2 = rng.standard_normal((B, H, H, C)).astype(np.float32)
    xy = np.linspace(0, 1, H, dtype=np.float32)
    x = np.broadcast_to(xy[None, None, :, None], (B, H, H, 1)).copy()
    y = np.broadcast_to(xy[None, :, None, None], (B, H, H, 1)).copy()
    t = rng.random((B,)).astype(np.float32)
    target = rng.standard_normal((B, H, H, 6)).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (f, f2, x, y, t, target))

  t0 = time.perf_counter()
  state, (loss, *_rest) = step_fn(
      jax.random.PRNGKey(int(time.time_ns()) % 2 ** 31), state, mask,
      host_batch(0))
  loss_val = float(np.asarray(loss))
  compile_s = time.perf_counter() - t0
  print(f'compile+first step: {compile_s:.1f}s  loss={loss_val:.4f}',
        flush=True)

  dev_batches = [host_batch(i) for i in range(args.steps)]
  jax.block_until_ready(dev_batches[-1])
  t0 = time.perf_counter()
  for i in range(args.steps):
    state, (loss, *_rest) = step_fn(
        jax.random.PRNGKey(int(time.time_ns()) % 2 ** 31 + i), state, mask,
        dev_batches[i])
  np.asarray(loss)
  dt = (time.perf_counter() - t0) / args.steps
  print(json.dumps({
      'microbatch': args.microbatch,
      'sec_per_step': round(dt, 4),
      'residual_pts_per_sec': round(B * H * H / dt, 1),
      'compile_s': round(compile_s, 1),
      'loss_finite': bool(np.isfinite(loss_val)),
  }), flush=True)


if __name__ == '__main__':
  main()
