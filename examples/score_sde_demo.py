"""Score-SDE end-to-end demo (reference: Score_SDE_demo_PyTorch.ipynb).

Trains a small DDPM++ on synthetic data for a few hundred steps, then
draws PC samples and a probability-flow likelihood estimate.

  PYTHONPATH=.:$PYTHONPATH python examples/score_sde_demo.py [--steps N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
  # The session's PJRT plugin ignores the env var; honor it explicitly.
  jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
import numpy as np


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--steps', type=int, default=200)
  ap.add_argument('--outdir', default='./demo_out')
  args = ap.parse_args()

  from b_pinn_kalman_filter_tpu import configs, models as mutils
  from b_pinn_kalman_filter_tpu.core import likelihood, losses, sampling, sde as sde_lib
  from b_pinn_kalman_filter_tpu.data import (get_data_inverse_scaler,
                                             get_data_scaler, get_dataset)
  from b_pinn_kalman_filter_tpu.train import state as state_lib
  from b_pinn_kalman_filter_tpu.utils.misc import save_image_grid

  config = configs.get_config("vp/cifar10_ddpmpp_continuous")
  config.data.image_size = 16
  config.model.nf = 32
  config.model.num_res_blocks = 2
  config.model.num_scales = 200
  config.training.batch_size = 64

  rng = jax.random.PRNGKey(0)
  model, variables = mutils.init_model(rng, config)
  tx = losses.get_optimizer(config)
  state = state_lib.create_train_state(variables['params'], tx,
                                       config.model.ema_rate)
  sde, eps = sde_lib.get_sde(config)
  scaler = get_data_scaler(config)
  inverse_scaler = get_data_inverse_scaler(config)
  train_iter = iter(get_dataset(config)[0])

  step_fn = jax.jit(losses.get_step_fn(
      sde, model, tx, train=True, reduce_mean=config.training.reduce_mean,
      continuous=True), donate_argnums=(1,))

  print(f"training {args.steps} steps ...")
  for step in range(args.steps):
    batch = scaler(jnp.asarray(next(train_iter)[0]))
    rng, srng = jax.random.split(rng)
    state, loss = step_fn(srng, state, batch)
    if step % 50 == 0:
      print(f"  step {step}: loss {float(loss):.4f}")

  print("PC sampling ...")
  shape = (16, 16, 16, 3)
  sampling_fn = sampling.maybe_jit_sampler(sampling.get_sampling_fn(
      config, sde, model, shape, inverse_scaler, eps))
  rng, k = jax.random.split(rng)
  samples, nfe = sampling_fn(k, state.ema_params)
  os.makedirs(args.outdir, exist_ok=True)
  save_image_grid(np.asarray(samples), os.path.join(args.outdir, "samples.png"))
  print(f"  nfe={int(nfe)}; wrote {args.outdir}/samples.png")

  print("bits/dim on one batch ...")
  lk = jax.jit(likelihood.get_likelihood_fn(sde, model, inverse_scaler))
  batch = scaler(jnp.asarray(next(train_iter)[0][:8]))
  rng, k = jax.random.split(rng)
  bpd, z, nfe = lk(k, state.ema_params, batch)
  print(f"  mean bpd {float(bpd.mean()):.3f} (nfe {int(nfe)})")


if __name__ == '__main__':
  main()
