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


def microbatch_chunk(batch: int, microbatch: int) -> int:
  """Largest divisor of ``batch`` that is <= ``microbatch``.

  The gradient-accumulation reshape needs n_chunks * C == batch exactly,
  and rounding C *up* would exceed the requested memory bound the knob
  exists to enforce.  (batch < microbatch degrades to one full-batch
  chunk; worst case C=1.)
  """
  return max(c for c in range(1, min(microbatch, batch) + 1)
             if batch % c == 0)


def get_pinn_step_fn(config, model: pinn_mod.PINN,
                     tx: optax.GradientTransformation, train: bool) -> Callable:
  """Phase-2 step: data losses + NS-residual regularization
  (reference losses.py:332-386; Re=1e7, losses.py:345).

  **Microbatched residual gradients** (``config.tpu.pinn_microbatch = C``,
  0 = off): the NS-residual term is a mean over batch samples and the
  networks are batch-independent (InstanceNorm), so its parameter gradient
  decomposes exactly into an average of per-chunk gradients.  A
  ``lax.scan`` over B/C chunks accumulates grads of the *fused*
  (shared-vjp + HVP) residual schedule — the live derivative graph scales
  with C, which is what lets the pass-count-optimal formulation fit HBM
  (full-batch it OOMs; pinn/pinn.py equation_mse docstring).  Values and
  gradients are exact, bit-identical modulo float summation order
  (tests/test_pinn_residual_parity.py).
  """
  variance = config.inverse.variance
  Re = 10000000.0
  pinn_weight = config.training.pinn_loss_weight
  microbatch = int(getattr(getattr(config, 'tpu', None), 'pinn_microbatch', 0)
                   or 0)

  def data_loss_fn(params, f1m, f2m, x, y, t, target):
    flow_pred, pres_pred = model.apply({'params': params}, f1m, f2m, x, y, t,
                                       train=train)
    v_loss = multiscale_data_mse(flow_pred, target)
    p_loss = pressure_data_mse(pres_pred, target)
    return v_loss + p_loss

  def loss_fn(rng, params, mask, batch):
    f1, f2, x, y, t, target = batch
    r1, r2 = jax.random.split(rng)
    f1m = _mask_and_noise(r1, f1, mask, variance)
    f2m = _mask_and_noise(r2, f2, mask, variance)

    data_loss = data_loss_fn(params, f1m, f2m, x, y, t, target)
    pinn_loss = pinn_mod.equation_mse_from_outputs(
        model, params, f1m, f2m, x, y, t, Re, train=train) * pinn_weight
    return pinn_loss + data_loss, (pinn_loss, data_loss)

  def value_and_grad_microbatched(rng, params, mask, batch):
    """Exact (loss, aux), grads with the residual term scanned over
    batch chunks of size ``microbatch``."""
    f1, f2, x, y, t, target = batch
    r1, r2 = jax.random.split(rng)
    f1m = _mask_and_noise(r1, f1, mask, variance)
    f2m = _mask_and_noise(r2, f2, mask, variance)

    data_loss, g_data = jax.value_and_grad(
        lambda p: data_loss_fn(p, f1m, f2m, x, y, t, target))(params)

    B = f1.shape[0]
    C = microbatch_chunk(B, microbatch)
    n_chunks = B // C

    def to_chunks(a):
      return a.reshape((n_chunks, C) + a.shape[1:])

    chunks = jax.tree_util.tree_map(to_chunks, (f1m, f2m, x, y, t))

    def chunk_grad(params, cf1, cf2, cx, cy, ct):
      return jax.value_and_grad(
          lambda p: pinn_mod.equation_mse_from_outputs(
              model, p, cf1, cf2, cx, cy, ct, Re, train=train,
              fused=True))(params)

    def body(carry, chunk):
      l_acc, g_acc = carry
      cf1, cf2, cx, cy, ct = chunk
      l, g = chunk_grad(params, cf1, cf2, cx, cy, ct)
      g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
      return (l_acc + l, g_acc), None

    g_zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    (l_sum, g_sum), _ = jax.lax.scan(body, (jnp.zeros(()), g_zero), chunks)

    scale = pinn_weight / n_chunks
    pinn_loss = l_sum * scale
    grads = jax.tree_util.tree_map(lambda gd, gp: gd + gp * scale,
                                   g_data, g_sum)
    loss = pinn_loss + data_loss
    return (loss, (pinn_loss, data_loss)), grads

  if train:

    def step_fn(rng, state: TrainState, mask, batch):
      if microbatch > 0:
        (loss, (pinn_loss, data_loss)), grads = value_and_grad_microbatched(
            rng, state.params, mask, batch)
      else:
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
