"""Controlled-projection inverse sampling with the fast 'dpm' solver on the
real chip (the round-4 beyond-parity path for the reference's OTHER
conditional sampler, reference conditional_sampling.py:43-97 /
configs/inverse/nc_ddpmpp_inpaint.py sampler='controlled').

Same flagship program shape as the dps_fast bench stage (57.6M CIFAR-10
DDPM++, batch 16, 50% inpainting) so the two guided fast paths are directly
comparable; the controlled RHS needs NO grad-through-score, so it should be
the fastest guided sampler in the framework.  Untrained params give
identical FLOPs/structure; throughput is model-eval bound.

Jit pattern: the observation is a jit ARGUMENT (one trace/compile serves
every solve) — the eager per-solve re-trace cost on this 1-core host was
measured at ~60 s/solve (chip_logs/dps_fast.log run 1).
"""
import time

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np

from b_pinn_kalman_filter_tpu import configs
from b_pinn_kalman_filter_tpu import models as mutils
from b_pinn_kalman_filter_tpu.inverse.conditional_sampling import get_sampler
from b_pinn_kalman_filter_tpu.inverse.obsv_sde import get_obsvsde
from b_pinn_kalman_filter_tpu.inverse.operators import get_operator

config = configs.get_config("vp/cifar10_ddpmpp_continuous")
config.inverse = ml_collections.ConfigDict(dict(
    operator='inpaint', invert=False, ratio=0.5, sampler='controlled',
    variance=0.01, solver='dpm', dpm_steps=50))
print("devices:", jax.devices(), flush=True)

B = 16
shape = (B, config.data.image_size, config.data.image_size,
         config.data.num_channels)
model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
operator = get_operator(config)
_, inv_eps = get_obsvsde(
    config, jnp.zeros((B, shape[-1], shape[1] * shape[2])), operator)


@jax.jit
def solve(rng, params, observation):
  obsvsde, _ = get_obsvsde(config, observation, operator)
  fn = get_sampler(config, obsvsde, shape, eps=inv_eps)
  return fn(rng, model, params)


host = np.random.default_rng(int(time.time()))  # fresh inputs: tunnel memoizes


def fresh_obs(i):
  origin = host.random(shape).astype(np.float32) * 2 - 1
  return operator(jnp.asarray(origin), keep_shape=False)


t0 = time.time()
out = np.asarray(solve(jax.random.PRNGKey(1), variables['params'],
                       fresh_obs(0)))
print(f"first call (incl. compile): {time.time()-t0:.0f}s", flush=True)
assert np.isfinite(out).all()

times = []
for i in range(1, 4):
  obs = jax.block_until_ready(fresh_obs(i))
  t0 = time.time()
  out = np.asarray(solve(jax.random.PRNGKey(1 + i), variables['params'], obs))
  times.append(time.time() - t0)
  print(f"solve {i}: {times[-1]:.2f}s -> {B/times[-1]:.2f} imgs/sec",
        flush=True)

assert np.isfinite(out).all()
dt = min(times)
print(f"CONTROLLED_FAST_CHIP_OK {B/dt:.2f} imgs/sec/chip "
      f"(batch {B}, {dt:.2f}s/solve, dpm_steps=50)", flush=True)
