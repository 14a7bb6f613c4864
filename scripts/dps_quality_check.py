"""Trained-model quality check for the guided fast DPS path.

Trains a small DDPM on synthetic smooth fields, then solves the same 50%%
inpainting posterior three ways — the reference-semantics 'fixed' Euler
(5000 steps), adaptive 'RK45', and the beyond-parity 'dpm' 50-step guided
DPM-Solver++ — and compares observed/unobserved pixel MSE against the true
origin and wall-clock.  The analytic-score tests
(tests/test_inverse.py::test_dps_dpm_*) prove the fast path integrates the
identical conditional ODE; this shows the quality equivalence on a
*learned* score end-to-end.

Runs on CPU by default (DPS_QC_CPU=0 to use the session backend).
Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dps_quality_check.py
"""

import os
import time

import jax

if os.environ.get('DPS_QC_CPU', '1') == '1':
  jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import ml_collections
import numpy as np

from b_pinn_kalman_filter_tpu import configs, models as mutils
from b_pinn_kalman_filter_tpu.core import losses, sde as sde_lib
from b_pinn_kalman_filter_tpu.data import get_data_scaler, get_data_inverse_scaler
from b_pinn_kalman_filter_tpu.inverse.conditional_sampling import get_sampler
from b_pinn_kalman_filter_tpu.inverse.obsv_sde import get_obsvsde
from b_pinn_kalman_filter_tpu.inverse.operators import get_operator
from b_pinn_kalman_filter_tpu.train import state as state_lib

H = 16
BATCH = 128
TRAIN_STEPS = 3000
SOLVE_BATCH = 8


def make_data(n, seed):
  """Smooth random Fourier fields in [0,1], (n, H, H, 1)."""
  rng = np.random.default_rng(seed)
  yy, xx = np.mgrid[0:H, 0:H].astype(np.float32) / H
  a = rng.standard_normal((n, 3, 1, 1)).astype(np.float32)
  f = rng.integers(1, 4, size=(n, 3, 2)).astype(np.float32)
  ph = (rng.random((n, 3, 1, 1)) * 2 * np.pi).astype(np.float32)
  phase = (f[:, :, 0:1, None] * xx[None, None] +
           f[:, :, 1:2, None] * yy[None, None])
  field = (a * np.sin(2 * np.pi * phase + ph)).sum(1)
  lo, hi = field.min(), field.max()
  return ((field - lo) / (hi - lo))[..., None]


def main():
  config = configs.get_config("vp/cifar10_ddpmpp_continuous")
  config.data.image_size = H
  config.data.num_channels = 1
  config.training.batch_size = BATCH
  config.model.nf = 32
  config.model.ch_mult = (1, 2)
  config.model.num_res_blocks = 2
  config.model.attn_resolutions = (8,)
  config.inverse = ml_collections.ConfigDict(dict(
      operator='inpaint', invert=False, ratio=0.5, sampler='dps',
      variance=0.01, solver='fixed'))
  print("backend:", jax.default_backend(), flush=True)

  train_data = make_data(4096, 0)
  scaler = get_data_scaler(config)
  inverse_scaler = get_data_inverse_scaler(config)

  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  tx = losses.get_optimizer(config)
  state = state_lib.create_train_state(variables['params'], tx,
                                       config.model.ema_rate)
  sde, eps_sde = sde_lib.get_sde(config)
  step_fn = jax.jit(
      losses.get_step_fn(sde, model, tx, train=True,
                         reduce_mean=config.training.reduce_mean,
                         continuous=True),
      donate_argnums=(1,))

  rng = np.random.default_rng(2)
  key = jax.random.PRNGKey(3)
  t0 = time.time()
  for step in range(TRAIN_STEPS):
    idx = rng.integers(0, len(train_data), BATCH)
    batch = scaler(jnp.asarray(train_data[idx]))
    key, sk = jax.random.split(key)
    state, loss = step_fn(sk, state, batch)
    if step % 500 == 0 or step == TRAIN_STEPS - 1:
      print(f"step {step}: loss {float(loss):.4f} "
            f"({time.time()-t0:.0f}s)", flush=True)
  params = jax.device_get(state).ema_params

  # Posterior problem: 50% random inpainting of held-out fields, in the
  # model's scaled domain (the samplers return unscaled [0,1]-ish values
  # via config scalers; here data scaler is identity-ish [0,1]->[-1,1]?
  # get_data_scaler honors config.data.centered).
  origin01 = make_data(SOLVE_BATCH, 7)
  origin = np.asarray(scaler(jnp.asarray(origin01)))
  operator = get_operator(config)
  observation = operator(jnp.asarray(origin), keep_shape=False)
  mask = np.asarray(operator.mask)[None]          # (1, H, H, 1)
  data_var = float(origin01.var())
  print(f"data variance {data_var:.4f} (prior-only unobserved-MSE scale)",
        flush=True)

  for solver, extra in (('fixed', {}), ('RK45', {}),
                        ('dpm', dict(dpm_steps=50)),
                        ('dpm', dict(dpm_steps=20))):
    config.inverse.solver = solver
    for k, v in extra.items():
      config.inverse[k] = v
    obsvsde, inv_eps = get_obsvsde(config, observation, operator)
    fn = get_sampler(config, obsvsde, origin.shape, eps=inv_eps)
    t0 = time.time()
    out = np.asarray(fn(jax.random.PRNGKey(11), model, params))
    dt = time.time() - t0
    out01 = np.asarray(inverse_scaler(jnp.asarray(out)))
    err = (out01 - origin01) ** 2
    mse_obs = float((err * mask).sum() / (mask.sum() * SOLVE_BATCH))
    mse_unobs = float((err * (1 - mask)).sum() /
                      ((1 - mask).sum() * SOLVE_BATCH))
    tag = f"{solver}{extra.get('dpm_steps', '')}"
    print(f"{tag:>8}: observed MSE {mse_obs:.5f}  unobserved MSE "
          f"{mse_unobs:.5f}  ({dt:.1f}s for {SOLVE_BATCH})", flush=True)
  print("DPS_QC_DONE", flush=True)


if __name__ == '__main__':
  main()
