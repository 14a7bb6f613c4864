"""Model registry, score-fn adapters (reference: models/utils.py).

The torch reference wraps models in ``torch.nn.DataParallel``
(models/utils.py:93); here parallelism is a device mesh + sharded ``jit``
(see ``parallel.mesh``), so ``create_model`` just returns a flax Module —
replication/sharding happens at the train-step level.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from b_pinn_kalman_filter_tpu.core import sde as sde_lib
from b_pinn_kalman_filter_tpu.core.sde import batch_mul

_MODELS = {}


def to_flattened_numpy(x) -> np.ndarray:
  """Flatten to a 1D numpy array (reference models/utils.py:181-183).
  Only needed when bridging to host-side solvers; the framework's
  integrators stay on-device."""
  return np.asarray(x).reshape(-1)


def from_flattened_numpy(x, shape) -> jnp.ndarray:
  """Reshape a flat numpy array to a jnp array (reference models/utils.py:186-188)."""
  return jnp.asarray(np.asarray(x).reshape(shape))


def register_model(cls=None, *, name: Optional[str] = None):
  """Decorator registering a flax model class (reference models/utils.py:27)."""

  def _register(cls):
    local_name = cls.__name__ if name is None else name
    if local_name in _MODELS:
      raise ValueError(f'Already registered model with name: {local_name}')
    _MODELS[local_name] = cls
    return cls

  return _register if cls is None else _register(cls)


def get_model(name: str):
  return _MODELS[name]


def get_sigmas(config) -> np.ndarray:
  """Geometric noise levels for SMLD (reference models/utils.py:50-60)."""
  return np.exp(np.linspace(np.log(config.model.sigma_max),
                            np.log(config.model.sigma_min),
                            config.model.num_scales))


def get_ddpm_params(config) -> dict:
  """Original-DDPM beta/alpha schedule constants (reference models/utils.py:63-85)."""
  num_diffusion_timesteps = 1000
  beta_start = config.model.beta_min / config.model.num_scales
  beta_end = config.model.beta_max / config.model.num_scales
  betas = np.linspace(beta_start, beta_end, num_diffusion_timesteps, dtype=np.float64)
  alphas = 1.0 - betas
  alphas_cumprod = np.cumprod(alphas, axis=0)
  return {
      'betas': betas,
      'alphas': alphas,
      'alphas_cumprod': alphas_cumprod,
      'sqrt_alphas_cumprod': np.sqrt(alphas_cumprod),
      'sqrt_1m_alphas_cumprod': np.sqrt(1.0 - alphas_cumprod),
      'beta_min': beta_start * (num_diffusion_timesteps - 1),
      'beta_max': beta_end * (num_diffusion_timesteps - 1),
      'num_diffusion_timesteps': num_diffusion_timesteps,
  }


def create_model(config) -> nn.Module:
  """Instantiate the configured score model (reference models/utils.py:88-94)."""
  return get_model(config.model.name)(config)


def init_model(rng: jax.Array, config, model: Optional[nn.Module] = None):
  """Initialize model variables on a dummy batch. Returns (model, variables)."""
  if model is None:
    model = create_model(config)
  shape = (1, config.data.image_size, config.data.image_size,
           config.data.num_channels)
  x = jnp.zeros(shape, jnp.float32)
  labels = jnp.zeros((1,), jnp.float32)
  p_rng, d_rng = jax.random.split(rng)
  variables = model.init({'params': p_rng, 'dropout': d_rng}, x, labels, train=False)
  return model, variables


def get_model_fn(model: nn.Module, params, train: bool = False) -> Callable:
  """Raw model function (reference models/utils.py:97-126).

  Returns ``model_fn(x, labels, rng=None)``; ``rng`` feeds dropout in
  train mode.
  """

  def model_fn(x, labels, rng=None):
    rngs = {'dropout': rng} if (train and rng is not None) else None
    return model.apply({'params': params}, x, labels, train=train, rngs=rngs)

  return model_fn


def get_score_fn(sde, model: nn.Module, params, train: bool = False,
                 continuous: bool = False) -> Callable:
  """Adapt model output to a true score function (reference models/utils.py:129-178)."""
  model_fn = get_model_fn(model, params, train=train)

  if isinstance(sde, (sde_lib.VPSDE, sde_lib.subVPSDE)):

    def score_fn(x, t, rng=None):
      if continuous or isinstance(sde, sde_lib.subVPSDE):
        # Continuous-time models assume a max time-embedding value of 999.
        labels = t * 999
        score = model_fn(x, labels, rng)
        std = sde.marginal_coef(t)[1]
      else:
        labels = t * (sde.N - 1)
        score = model_fn(x, labels, rng)
        std = sde.sqrt_1m_alphas_cumprod[labels.astype(jnp.int32)]
      return batch_mul(-1.0 / std, score)

  elif isinstance(sde, sde_lib.VESDE):

    def score_fn(x, t, rng=None):
      if continuous:
        labels = sde.marginal_coef(t)[1]
      else:
        # For VE-trained models, t=0 corresponds to the highest noise level.
        labels = jnp.round((sde.T - t) * (sde.N - 1)).astype(jnp.int32)
      return model_fn(x, labels, rng)

  else:
    raise NotImplementedError(f"SDE class {sde.__class__.__name__} not yet supported.")

  return score_fn
