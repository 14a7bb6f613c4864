"""Attribution of the DDPM++ forward cost on the real TPU by ablation.

Times the scanned U-Net forward (the PC sampler's floor) with components
knocked out one at a time: attention, GroupNorm, SiLU, resolution levels.
Deltas attribute wall time to each component far more honestly than
microbenchmarks, which the tunnel's memoization can distort.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_ablation.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def fresh(shape, dtype=jnp.float32):
  k = jax.random.PRNGKey(int(time.time_ns()) % 2 ** 31)
  return jax.random.normal(k, shape, dtype)


class _IdentityNorm(nn.Module):
  """GroupNorm stand-in: keeps a scale param so the param tree count moves
  but the op is a single multiply (no stats reductions)."""
  num_groups: int = 32
  epsilon: float = 1e-6
  dtype: jnp.dtype = jnp.float32
  use_bias: bool = True
  use_scale: bool = True
  group_size: int = None  # noqa: unused, GroupNorm API compat

  @nn.compact
  def __call__(self, x):
    scale = self.param('scale', nn.initializers.ones, (x.shape[-1],))
    return x * scale.astype(x.dtype)


def time_forward(config, label, n=100, B=64):
  from b_pinn_kalman_filter_tpu import models as mutils
  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  params = variables['params']

  def model_chain(x, params):
    def body(h, t):
      labels = jnp.full((B,), t * 999.0)
      out = model.apply({'params': params}, h, labels, train=False)
      return out * 0.01, None
    h, _ = jax.lax.scan(body, x, jnp.linspace(1.0, 1e-3, n))
    return jnp.sum(h)

  fn = jax.jit(model_chain)
  t0 = time.perf_counter()
  np.asarray(fn(fresh((B, 32, 32, 3)), params))
  compile_s = time.perf_counter() - t0
  times = []
  for _ in range(3):
    x = fresh((B, 32, 32, 3))
    t0 = time.perf_counter()
    np.asarray(fn(x, params))
    times.append(time.perf_counter() - t0)
  dt = min(times) / n
  print(json.dumps({'label': label, 'ms_per_eval': round(dt * 1e3, 3),
                    'imgs_per_sec_at_N1000': round(B / dt / 1000, 2),
                    'compile_s': round(compile_s, 1)}), flush=True)
  return dt


def main():
  from b_pinn_kalman_filter_tpu import configs
  dev = jax.devices()[0]
  print(f'device: {dev.platform} {dev.device_kind}', flush=True)

  base = configs.get_config('vp/cifar10_ddpmpp_continuous')
  time_forward(base, 'full model')

  cfg = configs.get_config('vp/cifar10_ddpmpp_continuous')
  cfg.model.attn_resolutions = ()
  time_forward(cfg, 'no attention')

  # GroupNorm -> scale-only identity (keeps conv structure identical).
  real_gn = nn.GroupNorm
  nn.GroupNorm = _IdentityNorm
  try:
    time_forward(configs.get_config('vp/cifar10_ddpmpp_continuous'),
                 'GroupNorm -> identity')
  finally:
    nn.GroupNorm = real_gn

  # SiLU -> identity: isolates activation bandwidth.
  real_silu = jax.nn.silu
  jax.nn.silu = lambda x: x
  try:
    time_forward(configs.get_config('vp/cifar10_ddpmpp_continuous'),
                 'SiLU -> identity')
  finally:
    jax.nn.silu = real_silu

  # Halve the resblock count: how much of the cost scales with depth.
  cfg = configs.get_config('vp/cifar10_ddpmpp_continuous')
  cfg.model.num_res_blocks = cfg.model.num_res_blocks // 2
  time_forward(cfg, f'num_res_blocks={cfg.model.num_res_blocks}')

  # Drop progressive/FIR resampling cost: nearest resample.
  cfg = configs.get_config('vp/cifar10_ddpmpp_continuous')
  if hasattr(cfg.model, 'fir'):
    cfg.model.fir = False
    time_forward(cfg, 'fir=False')


if __name__ == '__main__':
  main()
