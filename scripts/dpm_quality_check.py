"""Trained-model quality check for the DPM-Solver++ fast sampler.

Trains a small DDPM on synthetic smooth fields, then compares PC sampling
at the reference's N=1000 semantics against DPM-Solver++ at 10/20 NFE on
the hermetic random-proxy FID (train/evaluation.py), with a data-vs-data
calibration floor.  The analytic-score tests (tests/test_dpm_solver.py)
prove solver correctness; this shows the NFE/quality trade on a *learned*
score end-to-end.

Runs on CPU by default (DPM_QC_CPU=0 to use the session backend).
Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dpm_quality_check.py
"""

import os
import time

import jax

if os.environ.get('DPM_QC_CPU', '1') == '1':
  jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from b_pinn_kalman_filter_tpu import configs, models as mutils
from b_pinn_kalman_filter_tpu.core import losses, sampling, sde as sde_lib
from b_pinn_kalman_filter_tpu.data import get_data_scaler, get_data_inverse_scaler
from b_pinn_kalman_filter_tpu.train import evaluation, state as state_lib

H = 16
BATCH = 128
TRAIN_STEPS = 3000
SAMPLE_BATCH = 256


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
  print("backend:", jax.default_backend(), flush=True)

  train_data = make_data(4096, 0)
  held_out = make_data(512, 1)
  scaler = get_data_scaler(config)
  inverse_scaler = get_data_inverse_scaler(config)

  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  tx = losses.get_optimizer(config)
  state = state_lib.create_train_state(variables['params'], tx,
                                       config.model.ema_rate)
  sde, eps = sde_lib.get_sde(config)
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

  shape = (SAMPLE_BATCH, H, H, 1)
  feature_fn = evaluation.make_random_feature_fn(
      jax.random.PRNGKey(7), (H, H, 1))

  def fid_vs_holdout(samples):
    f_s, _ = feature_fn(jnp.asarray(np.clip(np.asarray(samples), 0, 1)))
    f_h, _ = feature_fn(jnp.asarray(held_out))
    return evaluation.frechet_distance(np.asarray(f_s), np.asarray(f_h))

  # Calibration: data-vs-data floor.
  floor = fid_vs_holdout(make_data(SAMPLE_BATCH, 9))
  print(f"calibration: data-vs-data proxy FID {floor:.4f}", flush=True)

  # Reference-semantics PC at N=1000.
  pc_fn = jax.jit(sampling.get_pc_sampler(
      sde, model, shape, sampling.get_predictor('euler_maruyama'),
      sampling.get_corrector('none'), inverse_scaler, snr=0.16,
      continuous=True, denoise=True, eps=eps))
  t0 = time.time()
  pc_samples, pc_nfe = pc_fn(jax.random.PRNGKey(11), params)
  pc_samples = np.asarray(pc_samples)
  pc_t = time.time() - t0
  print(f"PC  nfe={int(pc_nfe)}: proxy FID {fid_vs_holdout(pc_samples):.4f} "
        f"({pc_t:.0f}s for {SAMPLE_BATCH})", flush=True)

  for steps in (10, 20, 50):
    dpm_fn = jax.jit(sampling.get_dpm_solver_sampler(
        sde, model, shape, inverse_scaler, steps=steps, order=2,
        continuous=True, denoise=True, eps=eps))
    t0 = time.time()
    s, nfe = dpm_fn(jax.random.PRNGKey(12 + steps), params)
    s = np.asarray(s)
    print(f"DPM nfe={int(nfe)}: proxy FID {fid_vs_holdout(s):.4f} "
          f"({time.time()-t0:.0f}s for {SAMPLE_BATCH})", flush=True)
  print("DPM_QC_DONE", flush=True)


if __name__ == '__main__':
  main()
