"""Score-matching losses, optimizers, and jittable train/eval steps.

TPU-native redesign of the reference losses module (reference: losses.py).
The reference's optimize_fn (warmup + clip + Adam, losses.py:29-66) becomes an
optax chain; ``get_step_fn`` returns a pure ``step_fn(rng, state, batch)``
suitable for ``jax.jit`` (donated state) and ``jax.lax.scan``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from b_pinn_kalman_filter_tpu.core import sde as sde_lib
from b_pinn_kalman_filter_tpu.core.sde import batch_mul
from b_pinn_kalman_filter_tpu.models import registry as mutils
from b_pinn_kalman_filter_tpu.train.state import TrainState, ema_update


def get_optimizer(config, lr_mul: float = 1.0,
                  is_bpinn: bool = False) -> optax.GradientTransformation:
  """Adam with linear LR warmup and global-norm grad clipping
  (reference losses.py:29-66, optimize_fn semantics folded in)."""
  if is_bpinn:
    lr = config.optim.bpinn_lr
    decay = config.optim.bpinn_weight_decay
  else:
    lr = config.optim.lr
    decay = config.optim.weight_decay

  if config.optim.optimizer != 'Adam':
    raise NotImplementedError(f'Optimizer {config.optim.optimizer} not supported yet!')

  lr = lr * lr_mul
  warmup = config.optim.warmup

  def schedule(step):
    if warmup > 0:
      return lr * jnp.minimum(step / warmup, 1.0)
    return lr

  chain = []
  if config.optim.grad_clip >= 0:
    chain.append(optax.clip_by_global_norm(config.optim.grad_clip))
  if decay > 0:
    # torch Adam's weight_decay is *coupled* L2: decay*param is added to the
    # gradient before the moment updates (not AdamW's decoupled decay), so
    # place add_decayed_weights before the adam transform.
    chain.append(optax.add_decayed_weights(decay))
  chain.append(optax.adam(schedule, b1=config.optim.beta1, b2=0.999,
                          eps=config.optim.eps))
  return optax.chain(*chain)


def _reduce_op(reduce_mean: bool):
  if reduce_mean:
    return lambda x: jnp.mean(x, axis=-1)
  return lambda x: 0.5 * jnp.sum(x, axis=-1)


def get_sde_loss_fn(sde, model, train: bool, reduce_mean: bool = True,
                    continuous: bool = True, likelihood_weighting: bool = True,
                    eps: float = 1e-5) -> Callable:
  """Continuous denoising-score-matching loss (reference losses.py:69-115)."""
  reduce_op = _reduce_op(reduce_mean)

  def loss_fn(rng, params, batch):
    score_fn = mutils.get_score_fn(sde, model, params, train=train,
                                   continuous=continuous)
    t_rng, z_rng, drop_rng = jax.random.split(rng, 3)
    t = jax.random.uniform(t_rng, (batch.shape[0],),
                           minval=eps, maxval=sde.T)
    z = jax.random.normal(z_rng, batch.shape)
    mean, std = sde.marginal_prob(batch, t)
    perturbed_data = mean + batch_mul(std, z)
    score = score_fn(perturbed_data, t, rng=drop_rng)

    if not likelihood_weighting:
      losses = jnp.square(batch_mul(std, score) + z)
      losses = reduce_op(losses.reshape(losses.shape[0], -1))
    else:
      g2 = sde.sde(jnp.zeros_like(batch), t)[1] ** 2
      losses = jnp.square(score + batch_mul(1.0 / std, z))
      losses = reduce_op(losses.reshape(losses.shape[0], -1)) * g2

    return jnp.mean(losses)

  return loss_fn


def get_smld_loss_fn(vesde, model, train: bool, reduce_mean: bool = False) -> Callable:
  """Legacy SMLD (NCSN) loss (reference losses.py:118-139)."""
  assert isinstance(vesde, sde_lib.VESDE), "SMLD training only works for VESDEs."
  # SMLD models assume descending sigmas.
  smld_sigma_array = jnp.flip(vesde.discrete_sigmas)
  reduce_op = _reduce_op(reduce_mean)

  def loss_fn(rng, params, batch):
    model_fn = mutils.get_model_fn(model, params, train=train)
    l_rng, z_rng, drop_rng = jax.random.split(rng, 3)
    labels = jax.random.randint(l_rng, (batch.shape[0],), 0, vesde.N)
    sigmas = smld_sigma_array[labels]
    noise = batch_mul(sigmas, jax.random.normal(z_rng, batch.shape))
    perturbed_data = noise + batch
    score = model_fn(perturbed_data, labels, drop_rng)
    target = -batch_mul(1.0 / sigmas ** 2, noise)
    losses = jnp.square(score - target)
    losses = reduce_op(losses.reshape(losses.shape[0], -1)) * sigmas ** 2
    return jnp.mean(losses)

  return loss_fn


def get_ddpm_loss_fn(vpsde, model, train: bool, reduce_mean: bool = True) -> Callable:
  """Legacy discrete DDPM loss (reference losses.py:142-162)."""
  assert isinstance(vpsde, sde_lib.VPSDE), "DDPM training only works for VPSDEs."
  reduce_op = _reduce_op(reduce_mean)

  def loss_fn(rng, params, batch):
    model_fn = mutils.get_model_fn(model, params, train=train)
    l_rng, z_rng, drop_rng = jax.random.split(rng, 3)
    labels = jax.random.randint(l_rng, (batch.shape[0],), 0, vpsde.N)
    noise = jax.random.normal(z_rng, batch.shape)
    perturbed_data = (batch_mul(vpsde.sqrt_alphas_cumprod[labels], batch)
                      + batch_mul(vpsde.sqrt_1m_alphas_cumprod[labels], noise))
    score = model_fn(perturbed_data, labels, drop_rng)
    losses = jnp.square(score - noise)
    losses = reduce_op(losses.reshape(losses.shape[0], -1))
    return jnp.mean(losses)

  return loss_fn


def get_step_fn(sde, model, tx: optax.GradientTransformation, train: bool,
                reduce_mean: bool = False, continuous: bool = True,
                likelihood_weighting: bool = False) -> Callable:
  """One-step train/eval function (reference losses.py:165-224).

  Returns ``step_fn(rng, state, batch) -> (new_state, loss)``, pure and
  jittable; gradients psum automatically when batch is mesh-sharded.
  Eval runs under EMA params (the reference's store/copy_to/restore dance
  becomes a direct read of ``state.ema_params``).
  """
  if continuous:
    make_loss = lambda tr: get_sde_loss_fn(
        sde, model, tr, reduce_mean=reduce_mean, continuous=True,
        likelihood_weighting=likelihood_weighting)
  else:
    assert not likelihood_weighting, \
        "Likelihood weighting is not supported for original SMLD/DDPM training."
    if isinstance(sde, sde_lib.VESDE):
      make_loss = lambda tr: get_smld_loss_fn(sde, model, tr, reduce_mean=reduce_mean)
    elif isinstance(sde, sde_lib.VPSDE):
      make_loss = lambda tr: get_ddpm_loss_fn(sde, model, tr, reduce_mean=reduce_mean)
    else:
      raise ValueError(
          f"Discrete training for {sde.__class__.__name__} is not recommended.")

  loss_fn = make_loss(train)

  if train:

    def step_fn(rng, state: TrainState, batch):
      grad_fn = jax.value_and_grad(lambda p: loss_fn(rng, p, batch))
      loss, grads = grad_fn(state.params)
      updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
      new_params = optax.apply_updates(state.params, updates)
      new_state = state.replace(
          step=state.step + 1,
          params=new_params,
          opt_state=new_opt_state,
          ema_params=ema_update(state, new_params),
      )
      return new_state, loss

  else:

    def step_fn(rng, state: TrainState, batch):
      loss = loss_fn(rng, state.ema_params, batch)
      return state, loss

  return step_fn
