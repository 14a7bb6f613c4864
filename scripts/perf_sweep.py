"""Perf exploration for the PC sampler (VERDICT r1 item #1).

Measures imgs/sec/chip across batch sizes on a shortened (N-step) scan,
reports XLA cost analysis (FLOPs) so MFU can be computed, and optionally
captures a jax.profiler trace.

Timing discipline per CLAUDE.md: fresh time-derived keys + full host
readback per measurement (the tunnel memoizes identical calls and its
block_until_ready does not reliably synchronize).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--batches', type=int, nargs='+', default=[64, 128, 256])
  ap.add_argument('--n', type=int, default=100, help='reverse steps (scaled-down from 1000)')
  ap.add_argument('--runs', type=int, default=3)
  ap.add_argument('--trace', type=str, default='', help='profiler trace dir')
  ap.add_argument('--config', type=str, default='vp/cifar10_ddpmpp_continuous')
  ap.add_argument('--winograd', type=int, default=-1,
                  help='-1 config default, 0 off, 1 on')
  ap.add_argument('--fused_gn', type=int, default=-1,
                  help='-1 config default, 0 off, 1 on')
  args = ap.parse_args()

  dev = jax.devices()[0]
  print(f'device: {dev.platform} {dev.device_kind}', flush=True)

  from b_pinn_kalman_filter_tpu import configs, models as mutils
  from b_pinn_kalman_filter_tpu.core import sampling, sde as sde_lib
  from b_pinn_kalman_filter_tpu.data import get_data_inverse_scaler

  config = configs.get_config(args.config)
  config.model.num_scales = args.n  # sde.N drives the scan length
  if args.winograd >= 0:
    config.tpu.winograd = bool(args.winograd)
  if args.fused_gn >= 0:
    config.tpu.fused_groupnorm = bool(args.fused_gn)
  print(f'winograd: {config.tpu.get("winograd", False)} '
        f'fused_gn: {config.tpu.get("fused_groupnorm", False)}', flush=True)

  rng = jax.random.PRNGKey(0)
  model, variables = mutils.init_model(rng, config)
  params = variables['params']
  n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
  print(f'params: {n_params/1e6:.1f}M', flush=True)
  sde, eps = sde_lib.get_sde(config)
  inverse_scaler = get_data_inverse_scaler(config)

  def fresh_key():
    return jax.random.PRNGKey(int(time.time_ns()) % 2 ** 31)

  # The chunked PC path (sampling.pc_chunks > 1, now the NC/256² default)
  # returns a pre-dispatched plain function with no .lower — and chunking
  # is irrelevant to the cost analysis below, so sweep the single-scan
  # program.
  if config.sampling.get('pc_chunks', 0):
    with config.unlocked():
      config.sampling.pc_chunks = 0

  for batch in args.batches:
    shape = (batch, config.data.image_size, config.data.image_size,
             config.data.num_channels)
    fn = sampling.maybe_jit_sampler(sampling.get_sampling_fn(
        config, sde, model, shape, inverse_scaler, eps))
    t0 = time.perf_counter()
    lowered = fn.lower(fresh_key(), params)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
      cost = cost[0]
    flops = cost.get('flops', float('nan')) if cost else float('nan')
    np.asarray(compiled(fresh_key(), params)[0])  # warmup exec
    times = []
    for _ in range(args.runs):
      k = fresh_key()
      t0 = time.perf_counter()
      out, _ = compiled(k, params)
      np.asarray(out)
      times.append(time.perf_counter() - t0)
    dt = min(times)
    per_step_ms = dt / args.n * 1e3
    # imgs/sec extrapolated to N=1000 NFE
    imgs_sec_n1000 = batch / (dt * 1000 / args.n)
    tflops = flops / dt / 1e12 if flops == flops else float('nan')
    print(json.dumps({
        'batch': batch, 'n': args.n, 'min_s': round(dt, 4),
        'ms_per_step': round(per_step_ms, 3),
        'imgs_per_sec_at_N1000': round(imgs_sec_n1000, 3),
        'program_tflops_per_s': round(tflops, 1),
        'compile_s': round(compile_s, 1),
        'times': [round(t, 4) for t in times],
    }), flush=True)

  if args.trace:
    batch = args.batches[-1]
    shape = (batch, config.data.image_size, config.data.image_size,
             config.data.num_channels)
    fn = sampling.maybe_jit_sampler(sampling.get_sampling_fn(
        config, sde, model, shape, inverse_scaler, eps))
    np.asarray(fn(fresh_key(), params)[0])
    with jax.profiler.trace(args.trace):
      np.asarray(fn(fresh_key(), params)[0])
    print(f'trace written to {args.trace}', flush=True)


if __name__ == '__main__':
  main()
