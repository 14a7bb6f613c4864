"""Bayesian PINN: mean-field Gaussian posteriors over every weight
(reference: pinn_kalman/pinn.py:116-185 via ``bayesian_torch`` dnn_to_bnn).

TPU-native redesign: instead of swapping every Conv/Linear module for a
Bayesian twin (bayesian_torch's approach), the posterior lives as a
``{mu, rho}`` *pytree twin* of the deterministic param tree.  Sampling a
network is one reparameterized draw ``w = mu + softplus(rho) * eps`` over
the whole tree, and Monte-Carlo prediction is a ``vmap`` over draws — the
reference's Python MC loop (pinn.py:151-159) becomes one batched XLA
program.

MOPED initialization (Molchanov et al.; bayesian_torch moped_enable):
mu = pretrained weights, sigma = delta * |w|  =>  rho = softplus^-1(delta|w|).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Prior / posterior hyperparameters (reference pinn.py:121-138).
FLOW_PRIOR = dict(prior_mu=0.0, prior_sigma=0.1, posterior_mu_init=0.0,
                  posterior_rho_init=-3.0)
PRES_PRIOR = dict(prior_mu=0.0, prior_sigma=0.01, posterior_mu_init=0.0,
                  posterior_rho_init=-0.5)


def softplus(x):
  return jax.nn.softplus(x)


def inv_softplus(y):
  # softplus^-1(y) = log(expm1(y)); numerically safe for small y.
  y = jnp.maximum(y, 1e-12)
  return jnp.log(jnp.expm1(y))


def init_bayesian(params, rho_init: float) -> dict:
  """Fresh posterior around the given params with constant rho."""
  mu = jax.tree_util.tree_map(jnp.asarray, params)
  rho = jax.tree_util.tree_map(
      lambda p: jnp.full_like(p, rho_init), params)
  return {'mu': mu, 'rho': rho}


def init_bayesian_moped(params, delta: float) -> dict:
  """MOPED posterior from pretrained params: sigma = delta * |w|."""
  mu = jax.tree_util.tree_map(jnp.asarray, params)
  rho = jax.tree_util.tree_map(
      lambda p: inv_softplus(delta * jnp.abs(p)), params)
  return {'mu': mu, 'rho': rho}


def make_bpinn_params(pinn_params, config,
                      pretrained: bool = True) -> dict:
  """Build the B-PINN posterior tree {'flownet': {mu,rho}, 'pressurenet': ...}
  (reference B_PINN.__init__, pinn.py:117-149)."""
  delta = config.model.bpinn_moped_delta
  out = {}
  for key, prior in (('flownet', FLOW_PRIOR), ('pressurenet', PRES_PRIOR)):
    sub = pinn_params[key]
    if pretrained:
      out[key] = init_bayesian_moped(sub, delta)
    else:
      out[key] = init_bayesian(sub, prior['posterior_rho_init'])
  return out


def sample_params(rng: Array, bparams: dict) -> dict:
  """One reparameterized posterior draw of the full PINN param tree."""
  out = {}
  for key in bparams:
    mu, rho = bparams[key]['mu'], bparams[key]['rho']
    leaves, treedef = jax.tree_util.tree_flatten(mu)
    rngs = jax.random.split(jax.random.fold_in(rng, hash(key) % (2 ** 31)),
                            len(leaves))
    eps = [jax.random.normal(r, l.shape, l.dtype) for r, l in zip(rngs, leaves)]
    eps = jax.tree_util.tree_unflatten(treedef, eps)
    out[key] = jax.tree_util.tree_map(
        lambda m, r, e: m + softplus(r) * e, mu, rho, eps)
  return out


def _gaussian_kl(mu, sigma, prior_mu, prior_sigma):
  """KL(N(mu, sigma^2) || N(prior_mu, prior_sigma^2)), summed."""
  return jnp.sum(
      jnp.log(prior_sigma / sigma)
      + (sigma ** 2 + (mu - prior_mu) ** 2) / (2 * prior_sigma ** 2) - 0.5)


def kl_loss(bparams: dict) -> Tuple[Array, Array]:
  """(kl_flownet, kl_pressurenet) with their respective priors
  (reference get_kl_loss, losses.py:26,237-242)."""
  kls = {}
  for key, prior in (('flownet', FLOW_PRIOR), ('pressurenet', PRES_PRIOR)):
    mu_leaves = jax.tree_util.tree_leaves(bparams[key]['mu'])
    rho_leaves = jax.tree_util.tree_leaves(bparams[key]['rho'])
    total = 0.0
    for m, r in zip(mu_leaves, rho_leaves):
      total = total + _gaussian_kl(m, softplus(r), prior['prior_mu'],
                                   prior['prior_sigma'])
    kls[key] = total
  return kls['flownet'], kls['pressurenet']


def sample_uvp(rng: Array, model, bparams: dict, f1, f2, x, y, t,
               n: int = 64, size=None) -> Tuple[Array, Array]:
  """MC forward draws, vmapped (reference B_PINN.sample_uvp, pinn.py:151-159).

  Returns (flows (n, B, H, W, 2), pressures (n, B, H, W, 1))."""

  def one(draw_rng):
    params = sample_params(draw_rng, bparams)
    flow, pres = model.apply({'params': params}, f1, f2, x, y, t,
                             size=size, train=False)
    return flow[-1], pres

  return jax.vmap(one)(jax.random.split(rng, n))


def predict(rng: Array, model, bparams: dict, f1, f2, x, y, t, dt: float,
            n: int = 64):
  """MC mean/std of flow, pressure, and advected field
  (reference B_PINN.predict, pinn.py:161-182)."""
  from b_pinn_kalman_filter_tpu.pinn.pinn import pinn_step

  flows, press = sample_uvp(rng, model, bparams, f1, f2, x, y, t, n=n)
  f_pred = jax.vmap(lambda u: pinn_step(f2, u, dt))(flows)
  return (flows.mean(axis=0), press.mean(axis=0), f_pred.mean(axis=0),
          flows.std(axis=0), press.std(axis=0), f_pred.std(axis=0))


def get_bpinn_prelim_step_fn(config, model, tx, train: bool) -> Callable:
  """Phase-3 (B-PINN) prelim step: one posterior draw per step + KL terms
  (reference losses.py:233-329 with is_bpinn=True).

  State params are the posterior tree; gradients flow to mu AND rho through
  the reparameterized sample."""
  import optax
  from b_pinn_kalman_filter_tpu.models.flownet import (multiscale_data_mse,
                                                       pressure_data_mse)
  from b_pinn_kalman_filter_tpu.pinn.losses import (_gt_flow_pyramid,
                                                    _mask_and_noise)
  from b_pinn_kalman_filter_tpu.train.state import ema_update

  variance = config.inverse.variance
  bs = config.training.batch_size

  def loss_fn(rng, bparams, mask, batch):
    f1, f2, x, y, t, target = batch
    r1, r2, draw_rng = jax.random.split(rng, 3)
    f1m = _mask_and_noise(r1, f1, mask, variance)
    f2m = _mask_and_noise(r2, f2, mask, variance)

    params = sample_params(draw_rng, bparams)
    veloc_pred = model.apply({'params': params}, f1m, f2m, x, y, t,
                             train=train, method=model.flow_only)
    v_loss = multiscale_data_mse(veloc_pred, target)
    cascaded = _gt_flow_pyramid(config, target)
    pres_pred = model.apply({'params': params}, cascaded, x, y, t,
                            train=train, method=model.pressure_only)
    p_loss = pressure_data_mse(pres_pred, target)

    kl_flow, kl_pres = kl_loss(bparams)
    v_loss = v_loss + kl_flow / bs * 0.1
    p_loss = p_loss + kl_pres / bs * 0.01
    return v_loss + p_loss, (v_loss, p_loss)

  if train:

    def step_fn(rng, state, mask, batch):
      (loss, (v_loss, p_loss)), grads = jax.value_and_grad(
          lambda p: loss_fn(rng, p, mask, batch), has_aux=True)(state.params)
      updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
      new_params = optax.apply_updates(state.params, updates)
      new_state = state.replace(
          step=state.step + 1, params=new_params, opt_state=new_opt_state,
          ema_params=ema_update(state, new_params))
      return new_state, (loss, v_loss, p_loss)

  else:

    def step_fn(rng, state, mask, batch):
      loss, (v_loss, p_loss) = loss_fn(rng, state.ema_params, mask, batch)
      return state, (loss, v_loss, p_loss)

  return step_fn
