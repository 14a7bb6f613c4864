"""DPS inpainting inverse throughput on the real chip (BASELINE.md row 4's
pending dedicated measurement).  Uses the trained-model-free program shape:
untrained score net gives identical FLOPs/structure; throughput is
model-eval bound (one prob-flow solve with grad-through-score RHS)."""
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
if 'inverse' not in config:
  config.inverse = ml_collections.ConfigDict(dict(
      operator='inpaint', invert=False, ratio=0.5, sampler='dps',
      variance=0.01, solver='RK45'))
print("devices:", jax.devices(), flush=True)

B = 16
shape = (B, config.data.image_size, config.data.image_size,
         config.data.num_channels)
mesh = create_mesh(config)
model, variables = mutils.init_model(jax.random.PRNGKey(0), config)

rng = np.random.default_rng(int(time.time()))   # fresh inputs: tunnel memoizes
origin = (rng.random(shape).astype(np.float32) * 2 - 1)
operator = get_operator(config)
observation = operator(jnp.asarray(origin), keep_shape=False)
obsvsde, inv_eps = get_obsvsde(config, observation, operator)
dps_fn = get_sampler(config, obsvsde, shape, eps=inv_eps,
                     sharding=data_sharding(mesh))

t0 = time.time()
out = np.asarray(dps_fn(jax.random.PRNGKey(1), model, variables['params']))
print(f"first call (incl. compile): {time.time()-t0:.0f}s", flush=True)

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
  print(f"solve {i}: {times[-1]:.1f}s -> {B/times[-1]:.2f} imgs/sec",
        flush=True)

assert np.isfinite(out).all()
print(f"DPS_CHIP_OK {B/np.mean(times):.2f} imgs/sec/chip "
      f"(batch {B}, {np.mean(times):.1f}s/solve)", flush=True)
