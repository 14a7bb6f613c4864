"""Controllable generation: PC inpainting + colorization
(reference: controllable_generation.py).

Both loops are single ``lax.scan`` programs over the N reverse steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from b_pinn_kalman_filter_tpu.core.sde import batch_mul
from b_pinn_kalman_filter_tpu.models import registry as mutils


def get_pc_inpainter(sde, model, predictor, corrector, inverse_scaler, snr,
                     n_steps=1, probability_flow=False, continuous=False,
                     denoise=True, eps=1e-5):
  """PC image inpainter (reference controllable_generation.py:8-82).

  Returns ``fn(rng, params, data, mask)``; mask 1 = known pixels.
  """

  def make_inpaint_update(update_is_predictor):
    def inpaint_update_fn(rng, score_fn, data, mask, x, t):
      vec_t = jnp.full((data.shape[0],), t)
      u_rng, n_rng = jax.random.split(rng)
      if update_is_predictor:
        x, x_mean = predictor(u_rng, x, vec_t, sde, score_fn, probability_flow)
      else:
        x, x_mean = corrector(u_rng, x, vec_t, sde, score_fn, snr, n_steps)
      masked_data_mean, std = sde.marginal_prob(data, vec_t)
      masked_data = masked_data_mean + batch_mul(
          std, jax.random.normal(n_rng, x.shape))
      x = x * (1. - mask) + masked_data * mask
      x_mean = x * (1. - mask) + masked_data_mean * mask
      return x, x_mean

    return inpaint_update_fn

  corrector_update = make_inpaint_update(False)
  predictor_update = make_inpaint_update(True)

  def pc_inpainter(rng, params, data, mask):
    score_fn = mutils.get_score_fn(sde, model, params, train=False,
                                   continuous=continuous)
    rng, prior_rng = jax.random.split(rng)
    x = data * mask + sde.prior_sampling(prior_rng, data.shape) * (1. - mask)
    timesteps = jnp.linspace(sde.T, eps, sde.N)

    def step(carry, inp):
      x, _ = carry
      t, step_rng = inp
      c_rng, p_rng = jax.random.split(step_rng)
      x, x_mean = corrector_update(c_rng, score_fn, data, mask, x, t)
      x, x_mean = predictor_update(p_rng, score_fn, data, mask, x, t)
      return (x, x_mean), None

    (x, x_mean), _ = jax.lax.scan(
        step, (x, x), (timesteps, jax.random.split(rng, sde.N)))
    return inverse_scaler(x_mean if denoise else x)

  return pc_inpainter


# Orthonormal decoupling matrix: gray-scale occupies one latent channel
# (reference controllable_generation.py:107-111).
_M = np.array([[5.7735014e-01, -8.1649649e-01, 4.7008697e-08],
               [5.7735026e-01, 4.0824834e-01, 7.0710671e-01],
               [5.7735026e-01, 4.0824822e-01, -7.0710683e-01]], np.float32)
_invM = np.linalg.inv(_M)


def decouple(inputs):
  return jnp.einsum('bhwi,ij->bhwj', inputs, jnp.asarray(_M))


def couple(inputs):
  return jnp.einsum('bhwi,ij->bhwj', inputs, jnp.asarray(_invM))


def get_pc_colorizer(sde, model, predictor, corrector, inverse_scaler, snr,
                     n_steps=1, probability_flow=False, continuous=False,
                     denoise=True, eps=1e-5):
  """PC colorizer (reference controllable_generation.py:85-181).
  Returns ``fn(rng, params, gray_scale_img)``."""

  def get_mask(image):
    return jnp.concatenate([jnp.ones_like(image[..., :1]),
                            jnp.zeros_like(image[..., 1:])], axis=-1)

  def make_update(update_is_predictor):
    def colorization_update_fn(rng, score_fn, gray_scale_img, x, t):
      mask = get_mask(x)
      vec_t = jnp.full((x.shape[0],), t)
      u_rng, n_rng = jax.random.split(rng)
      if update_is_predictor:
        x, x_mean = predictor(u_rng, x, vec_t, sde, score_fn, probability_flow)
      else:
        x, x_mean = corrector(u_rng, x, vec_t, sde, score_fn, snr, n_steps)
      masked_data_mean, std = sde.marginal_prob(decouple(gray_scale_img), vec_t)
      masked_data = masked_data_mean + batch_mul(
          std, jax.random.normal(n_rng, x.shape))
      x = couple(decouple(x) * (1. - mask) + masked_data * mask)
      x_mean = couple(decouple(x) * (1. - mask) + masked_data_mean * mask)
      return x, x_mean

    return colorization_update_fn

  corrector_update = make_update(False)
  predictor_update = make_update(True)

  def pc_colorizer(rng, params, gray_scale_img):
    score_fn = mutils.get_score_fn(sde, model, params, train=False,
                                   continuous=continuous)
    shape = gray_scale_img.shape
    mask = get_mask(gray_scale_img)
    rng, prior_rng = jax.random.split(rng)
    x = couple(decouple(gray_scale_img) * mask
               + decouple(sde.prior_sampling(prior_rng, shape) * (1. - mask)))
    timesteps = jnp.linspace(sde.T, eps, sde.N)

    def step(carry, inp):
      x, _ = carry
      t, step_rng = inp
      c_rng, p_rng = jax.random.split(step_rng)
      x, x_mean = corrector_update(c_rng, score_fn, gray_scale_img, x, t)
      x, x_mean = predictor_update(p_rng, score_fn, gray_scale_img, x, t)
      return (x, x_mean), None

    (x, x_mean), _ = jax.lax.scan(
        step, (x, x), (timesteps, jax.random.split(rng, sde.N)))
    return inverse_scaler(x_mean if denoise else x)

  return pc_colorizer
