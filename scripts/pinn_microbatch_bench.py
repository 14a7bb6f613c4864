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


def make_host_batch(B, H, C, i, include_target):
  """Fresh time-derived inputs (tunnel memoizes identical computations);
  shared by the full-step and probe paths so both measure the same input
  regime."""
  rng = np.random.default_rng(int(time.time_ns()) % 2 ** 31 + i)
  f = rng.standard_normal((B, H, H, C)).astype(np.float32)
  f2 = rng.standard_normal((B, H, H, C)).astype(np.float32)
  xy = np.linspace(0, 1, H, dtype=np.float32)
  x = np.broadcast_to(xy[None, None, :, None], (B, H, H, 1)).copy()
  y = np.broadcast_to(xy[None, :, None, None], (B, H, H, 1)).copy()
  t = rng.random((B,)).astype(np.float32)
  arrays = [f, f2, x, y, t]
  if include_target:
    arrays.append(rng.standard_normal((B, H, H, 6)).astype(np.float32))
  return tuple(jnp.asarray(a) for a in arrays)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--microbatch', type=int, default=16)
  ap.add_argument('--steps', type=int, default=8)
  ap.add_argument('--image_size', type=int, default=0,
                  help='override config.data.image_size (0 = config value)')
  ap.add_argument('--batch_size', type=int, default=0,
                  help='override config.training.batch_size (0 = config)')
  ap.add_argument('--probe', choices=['', 'literal', 'fused'], default='',
                  help='probe mode: time only the residual value_and_grad '
                       'for one schedule (no optimizer / data loss / scan)')
  args = ap.parse_args()

  from b_pinn_kalman_filter_tpu import configs
  from b_pinn_kalman_filter_tpu.data import get_mask_dataset
  from b_pinn_kalman_filter_tpu.pinn import losses as pinn_losses
  from b_pinn_kalman_filter_tpu.pinn import pinn_lib
  from b_pinn_kalman_filter_tpu.train import state as state_lib

  print(f'backend: {jax.default_backend()} {jax.devices()}', flush=True)

  config = configs.get_config('pinn/pinn_pde')
  config.tpu.pinn_microbatch = args.microbatch
  if args.image_size:
    config.data.image_size = args.image_size
  if args.batch_size:
    config.training.batch_size = args.batch_size
  B = config.training.batch_size
  H = config.data.image_size
  C = config.data.num_channels
  print(f'scale: batch {B} at {H}^2, microbatch {args.microbatch}, '
        f'probe={args.probe!r}', flush=True)
  if args.probe:
    return probe(config, args)

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

  t0 = time.perf_counter()
  state, (loss, *_rest) = step_fn(
      jax.random.PRNGKey(int(time.time_ns()) % 2 ** 31), state, mask,
      make_host_batch(B, H, C, 0, include_target=True))
  loss_val = float(np.asarray(loss))
  compile_s = time.perf_counter() - t0
  print(f'compile+first step: {compile_s:.1f}s  loss={loss_val:.4f}',
        flush=True)

  dev_batches = [make_host_batch(B, H, C, i, include_target=True)
                 for i in range(args.steps)]
  jax.block_until_ready(dev_batches[-1])
  t0 = time.perf_counter()
  for i in range(args.steps):
    state, (loss, *_rest) = step_fn(
        jax.random.PRNGKey(int(time.time_ns()) % 2 ** 31 + i), state, mask,
        dev_batches[i])
  np.asarray(loss)  # donated state chains the steps; this forces all of them
  dt = (time.perf_counter() - t0) / args.steps
  print(json.dumps({
      'microbatch': args.microbatch,
      'sec_per_step': round(dt, 4),
      'residual_pts_per_sec': round(B * H * H / dt, 1),
      'compile_s': round(compile_s, 1),
      'loss_finite': bool(np.isfinite(loss_val)),
  }), flush=True)


def probe(config, args):
  """Time just ``value_and_grad(equation_mse_from_outputs)`` for one
  schedule — the decisive literal-vs-fused comparison with the smallest
  possible program (no optimizer, data loss, or scan wrapper)."""
  from b_pinn_kalman_filter_tpu.pinn import pinn as pinn_mod
  from b_pinn_kalman_filter_tpu.pinn import pinn_lib

  B = config.training.batch_size
  H = config.data.image_size
  C = config.data.num_channels
  fused = args.probe == 'fused'

  t0 = time.perf_counter()
  model, variables = pinn_lib.init_pinn(config, jax.random.PRNGKey(0))
  params = variables['params']
  print(f'init: {time.perf_counter() - t0:.1f}s', flush=True)

  grad_fn = jax.jit(jax.value_and_grad(
      lambda p, f1, f2, x, y, t: pinn_mod.equation_mse_from_outputs(
          model, p, f1, f2, x, y, t, 1e7, train=True, fused=fused)))

  t0 = time.perf_counter()
  val, grads = grad_fn(params, *make_host_batch(B, H, C, 0,
                                                include_target=False))
  val = float(np.asarray(val))
  compile_s = time.perf_counter() - t0
  print(f'compile+first: {compile_s:.1f}s  residual={val:.6e}', flush=True)

  batches = [make_host_batch(B, H, C, i, include_target=False)
             for i in range(args.steps)]
  jax.block_until_ready(batches[-1])
  t0 = time.perf_counter()
  val = jnp.zeros(())
  for i in range(args.steps):
    # Unlike main()'s donated-state chain, grad_fn calls share no state, so
    # chain them explicitly: feeding a zero-scaled previous output into t
    # makes call i depend on call i-1 completing, and the final readback
    # then forces the whole sequence (the tunnel's block_until_ready is not
    # a reliable barrier — CLAUDE.md timing discipline).
    f1c, f2c, xc, yc, tc = batches[i]
    val, grads = grad_fn(params, f1c, f2c, xc, yc, tc + val * 0.0)
  np.asarray(val)
  dt = (time.perf_counter() - t0) / args.steps
  g0 = float(np.asarray(jax.tree_util.tree_leaves(grads)[0]).ravel()[0])
  print(json.dumps({
      'probe': args.probe, 'batch': B, 'image_size': H,
      'sec_per_grad': round(dt, 4),
      'residual_pts_per_sec': round(B * H * H / dt, 1),
      'compile_s': round(compile_s, 1),
      'finite': bool(np.isfinite(val) and np.isfinite(g0)),
  }), flush=True)


if __name__ == '__main__':
  main()
