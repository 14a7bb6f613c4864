"""UKF fusion re-measure at reference scale (192^2, patch 8) with the
jitted cycle + jitted B-PINN measurement.  Prior eager number: ~90 s/cycle
(BASELINE.md round 3)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from b_pinn_kalman_filter_tpu import configs
from b_pinn_kalman_filter_tpu.data.datasets import _cached_ns_rollout
from b_pinn_kalman_filter_tpu.kalman.ukf_lib import PINN_KF
from b_pinn_kalman_filter_tpu.parallel import create_mesh
from b_pinn_kalman_filter_tpu.pinn import bayes
from b_pinn_kalman_filter_tpu.pinn.pinn_lib import init_pinn

config = configs.get_config("pinn/pinn_pde")
config.data.image_size = 192
config.kf.patch_size = 8
print("devices:", jax.devices(), flush=True)

size = config.data.image_size
data = _cached_ns_rollout(16, size, size, config.seed)
model, variables = init_pinn(config, jax.random.PRNGKey(0))
bparams = bayes.make_bpinn_params(variables['params'], config,
                                  pretrained=False)
pikal = PINN_KF(config, model, bparams, mesh=create_mesh(config))

def prep(channel, idx):
  return jnp.asarray(data[idx, channel])[None, :, :, None]

f0 = prep(2, 0)
v0 = jnp.concatenate([prep(3, 0), prep(4, 0)], axis=-1)
p0 = prep(5, 0)
pikal.initialize(f0, v0, p0)

rng = jax.random.PRNGKey(0)
t = jnp.asarray([1.0])
times, mses = [], []
for i in range(1, 11):
  x, y, f_gt = prep(0, i), prep(1, i), prep(2, i)
  rng, obs_rng, mc_rng = jax.random.split(rng, 3)
  f_obs = pikal.ukf.measurement.observe(obs_rng, f_gt)
  t0 = time.time()
  pred = pikal(mc_rng, x, y, t, f_obs)
  pred = np.asarray(pred)          # full readback = real sync on the tunnel
  times.append(time.time() - t0)
  mse = float(np.mean((pred[..., 0:1] - np.asarray(f_gt)) ** 2))
  mses.append(mse)
  print(f"cycle {i}: {times[-1]:.1f}s f-MSE {mse:.3e}", flush=True)
  t = t + 1

steady = times[2:]
print(f"UKF_CHIP_OK steady {np.mean(steady):.2f}s/cycle "
      f"(first {times[0]:.0f}s incl. compile); f-MSE {mses[0]:.3e} -> "
      f"{mses[-1]:.3e}", flush=True)
