"""PINN training losses / step functions
(reference: losses.py:233-387 — get_prelim_step_fn, get_pinn_step_fn).

Design notes (TPU-first):
* The reference runs two separate backward passes with two optimizers
  (flownet / pressurenet).  Because the preliminary flow loss touches only
  flownet params and the pressure loss only pressurenet params, a single
  joint backward yields identical gradients; per-subnet learning rates are
  an ``optax.multi_transform`` over the top-level param labels.
* The inpainting mask changes every step (operator.next()); it is passed
  into the jitted step as an array argument, keeping one compiled program.
* The reference's NaN-grad guard (losses.py:361-366) becomes a
  ``lax.cond``-gated update on an all-finite check of the full gradient.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from b_pinn_kalman_filter_tpu.models.flownet import (multiscale_data_mse,
                                                     pressure_data_mse,
                                                     resize_bilinear)
from b_pinn_kalman_filter_tpu.pinn import pinn as pinn_mod
from b_pinn_kalman_filter_tpu.train.state import TrainState, ema_update


def get_pinn_optimizer(config, lr_mul_pres: float = 1.0,
                       is_bpinn: bool = False) -> optax.GradientTransformation:
  """Dual-LR optimizer: flownet at base LR, pressurenet at base*lr_mul
  (reference pinn_lib.py:42-43 / :120-121 / :190-191)."""
  from b_pinn_kalman_filter_tpu.core.losses import get_optimizer

  tx_flow = get_optimizer(config, lr_mul=1.0, is_bpinn=is_bpinn)
  tx_pres = get_optimizer(config, lr_mul=lr_mul_pres, is_bpinn=is_bpinn)

  def label_fn(params):
    return {k: ('pres' if k == 'pressurenet' else 'flow') for k in params}

  return optax.multi_transform({'flow': tx_flow, 'pres': tx_pres}, label_fn)


def _mask_and_noise(rng, f, mask, variance):
  noise = jax.random.normal(rng, f.shape) * variance ** 0.5
  return mask * f + noise


def _gt_flow_pyramid(config, target):
  """Cascaded GT flow pyramid, coarsest-first
  (reference losses.py:262-269)."""
  cascaded = [target[..., 0:2]]
  for _ in range(len(config.model.feature_nums)):
    prev = cascaded[-1]
    size = (prev.shape[1] // 2, prev.shape[2] // 2)
    cascaded.append(resize_bilinear(prev, size))
  return cascaded[::-1]


def get_prelim_step_fn(config, model: pinn_mod.PINN,
                       tx: optax.GradientTransformation, train: bool,
                       kl_fn: Callable = None) -> Callable:
  """Phase-1 step: flow MSE + pressure MSE on masked+noised inputs
  (reference losses.py:233-329).

  Returns ``step_fn(rng, state, mask, batch) -> (state, (loss, v, p))`` with
  ``batch = (f1, f2, x, y, t, target)``.  ``kl_fn(params) -> (kl_flow,
  kl_pres)`` adds the B-PINN KL terms (reference :253-254, :272-274).
  """
  variance = config.inverse.variance

  def loss_fn(rng, params, mask, batch):
    f1, f2, x, y, t, target = batch
    r1, r2, d_rng = jax.random.split(rng, 3)
    f1m = _mask_and_noise(r1, f1, mask, variance)
    f2m = _mask_and_noise(r2, f2, mask, variance)

    veloc_pred = model.apply({'params': params}, f1m, f2m, x, y, t,
                             train=train, method=model.flow_only)
    v_loss = multiscale_data_mse(veloc_pred, target)

    cascaded = _gt_flow_pyramid(config, target)
    pres_pred = model.apply({'params': params}, cascaded, x, y, t,
                            train=train, method=model.pressure_only)
    p_loss = pressure_data_mse(pres_pred, target)

    if kl_fn is not None:
      kl_flow, kl_pres = kl_fn(params)
      bs = config.training.batch_size
      v_loss = v_loss + kl_flow / bs * 0.1
      p_loss = p_loss + kl_pres / bs * 0.01

    return v_loss + p_loss, (v_loss, p_loss)

  if train:

    def step_fn(rng, state: TrainState, mask, batch):
      (loss, (v_loss, p_loss)), grads = jax.value_and_grad(
          lambda p: loss_fn(rng, p, mask, batch), has_aux=True)(state.params)
      updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
      new_params = optax.apply_updates(state.params, updates)
      new_state = state.replace(
          step=state.step + 1, params=new_params, opt_state=new_opt_state,
          ema_params=ema_update(state, new_params))
      return new_state, (loss, v_loss, p_loss)

  else:

    def step_fn(rng, state: TrainState, mask, batch):
      loss, (v_loss, p_loss) = loss_fn(rng, state.ema_params, mask, batch)
      return state, (loss, v_loss, p_loss)

  return step_fn


def get_pinn_step_fn(config, model: pinn_mod.PINN,
                     tx: optax.GradientTransformation, train: bool) -> Callable:
  """Phase-2 step: data losses + NS-residual regularization
  (reference losses.py:332-386; Re=1e7, losses.py:345)."""
  variance = config.inverse.variance
  Re = 10000000.0
  pinn_weight = config.training.pinn_loss_weight

  def loss_fn(rng, params, mask, batch):
    f1, f2, x, y, t, target = batch
    r1, r2 = jax.random.split(rng)
    f1m = _mask_and_noise(r1, f1, mask, variance)
    f2m = _mask_and_noise(r2, f2, mask, variance)

    flow_pred, pres_pred = model.apply({'params': params}, f1m, f2m, x, y, t,
                                       train=train)
    v_loss = multiscale_data_mse(flow_pred, target)
    p_loss = pressure_data_mse(pres_pred, target)
    data_loss = v_loss + p_loss

    pinn_loss = pinn_mod.equation_mse_from_outputs(
        model, params, f1m, f2m, x, y, t, Re, train=train) * pinn_weight
    return pinn_loss + data_loss, (pinn_loss, data_loss)

  if train:

    def step_fn(rng, state: TrainState, mask, batch):
      (loss, (pinn_loss, data_loss)), grads = jax.value_and_grad(
          lambda p: loss_fn(rng, p, mask, batch), has_aux=True)(state.params)

      # NaN-grad guard (reference losses.py:361-366): skip the update if any
      # gradient is non-finite.
      finite = jnp.all(jnp.asarray(
          [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]))

      def do_update(_):
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state,
            ema_params=ema_update(state, new_params))

      new_state = jax.lax.cond(finite, do_update, lambda _: state, None)
      return new_state, (loss, pinn_loss, data_loss)

  else:

    def step_fn(rng, state: TrainState, mask, batch):
      loss, (pinn_loss, data_loss) = loss_fn(rng, state.ema_params, mask, batch)
      return state, (loss, pinn_loss, data_loss)

  return step_fn
