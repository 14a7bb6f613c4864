"""Inverse-problem driver (reference: inverse/inverse_lib.py)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from b_pinn_kalman_filter_tpu import models as mutils
from b_pinn_kalman_filter_tpu.core import losses
from b_pinn_kalman_filter_tpu.data import get_dataset
from b_pinn_kalman_filter_tpu.inverse.conditional_sampling import get_sampler
from b_pinn_kalman_filter_tpu.inverse.obsv_sde import get_obsvsde
from b_pinn_kalman_filter_tpu.inverse.operators import get_operator
from b_pinn_kalman_filter_tpu.parallel import mesh as mesh_lib
from b_pinn_kalman_filter_tpu.train import checkpoint as ckpt_lib
from b_pinn_kalman_filter_tpu.train import state as state_lib
from b_pinn_kalman_filter_tpu.utils.misc import save_image_grid


def _inverse_fn(config, model, params, rng, mesh=None):
  """Observe a test batch and sample the posterior
  (reference inverse_lib.py:36-52); batch-sharded over the mesh data axis."""
  sampling_shape = (config.training.batch_size,
                    config.data.image_size, config.data.image_size,
                    config.data.num_channels)

  _, test_ds = get_dataset(config)
  item = next(iter(test_ds))
  origin = jnp.asarray(item[0] if isinstance(item, tuple) else item)
  origin = origin[:config.training.batch_size]

  operator = get_operator(config)
  observation_vis = operator(origin, keep_shape=True)
  observation = operator(origin, keep_shape=False)   # ill-posed (B, C, N)

  sharding = None
  if mesh is not None:
    sharding = mesh_lib.data_sharding(mesh)
    observation = jax.device_put(np.asarray(observation), sharding)

  obsvsde, sampling_eps = get_obsvsde(config, observation, operator)
  sampling_fn = get_sampler(config, obsvsde, sampling_shape, eps=sampling_eps,
                            sharding=sharding)

  sample = sampling_fn(rng, model, params)
  return origin, observation_vis, sample, operator


def inverse(config, ckptdir, workdir):
  """CLI inverse mode (reference inverse_lib.py:54-78)."""
  mesh = mesh_lib.create_mesh(config)
  rng = jax.random.PRNGKey(config.seed)
  rng, init_rng = jax.random.split(rng)
  model, variables = mutils.init_model(init_rng, config)
  tx = losses.get_optimizer(config)
  state = state_lib.create_train_state(variables['params'], tx,
                                       config.model.ema_rate)
  if ckptdir:
    state = ckpt_lib.restore_checkpoint(ckptdir, state)
  state = mesh_lib.replicate(state, mesh)

  rng, sample_rng = jax.random.split(rng)
  origin, observation, sample, operator = _inverse_fn(
      config, model, state.ema_params, sample_rng, mesh=mesh)

  outdir = os.path.join(
      workdir, f"{config.inverse.operator}-{config.inverse.ratio}")
  os.makedirs(outdir, exist_ok=True)
  save_image_grid(np.asarray(sample), os.path.join(outdir, "inverse.png"))
  save_image_grid(np.asarray(observation),
                  os.path.join(outdir, "observation.png"))
  mse = evaluate_inverse(config, origin, sample, operator)
  with open(os.path.join(outdir, "mse.txt"), "w") as f:
    f.write(f"{mse}\n")
  return origin, observation, sample, mse


def evaluate_inverse(config, origin, inv, operator) -> float:
  """Reconstruction MSE (reference inverse_lib.py:80-95)."""
  if config.inverse.operator in ('inpaint', 'inpaint_rnd'):
    return float(jnp.mean((jnp.asarray(origin) - jnp.asarray(inv)) ** 2))
  raise NotImplementedError
