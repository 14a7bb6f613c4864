"""DPS inpainting throughput with the reference's FIXED-step solver
(reference conditional_sampling.py: 5000 Euler steps of the probability-
flow field, dt=-2e-5) — the second of the reference's DPS solver
semantics, complementing the RK45 row (chip_logs/dps.log).

The fixed field has a static 5000-iteration scan with one grad-through-
score RHS per step, so unlike RK45 its cost is shape-static.  Batch 8
keeps the single scan dispatch well under the ~70 s worker-crash
threshold (CLAUDE.md).  Fresh observations per solve: the tunnel
memoizes repeated identical computations.
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
from b_pinn_kalman_filter_tpu.parallel import create_mesh, data_sharding

config = configs.get_config("vp/cifar10_ddpmpp_continuous")
config.inverse = ml_collections.ConfigDict(dict(
    operator='inpaint', invert=False, ratio=0.5, sampler='dps',
    variance=0.01, solver='fixed'))
print("devices:", jax.devices(), flush=True)

B = 8
shape = (B, config.data.image_size, config.data.image_size,
         config.data.num_channels)
mesh = create_mesh(config)
model, variables = mutils.init_model(jax.random.PRNGKey(0), config)

rng = np.random.default_rng(int(time.time()))
origin = (rng.random(shape).astype(np.float32) * 2 - 1)
operator = get_operator(config)
observation = operator(jnp.asarray(origin), keep_shape=False)
obsvsde, inv_eps = get_obsvsde(config, observation, operator)
dps_fn = get_sampler(config, obsvsde, shape, eps=inv_eps,
                     sharding=data_sharding(mesh))

t0 = time.time()
out = np.asarray(dps_fn(jax.random.PRNGKey(1), model, variables['params']))
print(f"first call (incl. compile): {time.time()-t0:.0f}s", flush=True)
assert np.isfinite(out).all()

times = []
for i in range(3):
  o2 = (rng.random(shape).astype(np.float32) * 2 - 1)
  obs2 = operator(jnp.asarray(o2), keep_shape=False)
  sde2, eps2 = get_obsvsde(config, obs2, operator)
  fn2 = get_sampler(config, sde2, shape, eps=eps2,
                    sharding=data_sharding(mesh))
  t0 = time.time()
  out = np.asarray(fn2(jax.random.PRNGKey(2 + i), model, variables['params']))
  times.append(time.time() - t0)
  print(f"solve {i}: {times[-1]:.1f}s -> {B/times[-1]:.3f} imgs/sec",
        flush=True)

assert np.isfinite(out).all()
print(f"DPS_FIXED_CHIP_OK {B/min(times):.3f} imgs/sec/chip "
      f"(batch {B}, 5000-step fixed Euler, {min(times):.1f}s/solve)",
      flush=True)
