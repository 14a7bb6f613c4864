"""PINN / B-PINN training drivers (reference: pinn_kalman/pinn_lib.py).

Phase 1: preliminary FlowNet + PressureNet training (masked+noised inputs).
Phase 2: PINN-regularized joint training (NS residual loss).
Phase 3 (train_bpinn): Bayesian posterior training with MOPED warm start.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from absl import logging

from b_pinn_kalman_filter_tpu.data import get_dataset, get_mask_dataset
from b_pinn_kalman_filter_tpu.parallel import mesh as mesh_lib
from b_pinn_kalman_filter_tpu.pinn import bayes, losses as pinn_losses
from b_pinn_kalman_filter_tpu.pinn.pinn import PINN
from b_pinn_kalman_filter_tpu.train import checkpoint as ckpt_lib
from b_pinn_kalman_filter_tpu.train import state as state_lib


def _summary_writer(tb_dir):
  try:
    from torch.utils import tensorboard
    return tensorboard.SummaryWriter(tb_dir)
  except Exception:

    class _Null:
      def add_scalar(self, *a, **k):
        pass

    return _Null()


def unbatch(batch, mesh=None):
  """(f1, f2, x, y, t, target) host arrays -> float32 tuple, batch-sharded
  over the mesh data axis when given (reference pinn_lib.py:17-24;
  requires_grad becomes implicit in jax.grad)."""
  arrays = tuple(np.asarray(b, np.float32) for b in batch)
  if mesh is not None:
    return mesh_lib.shard_batch(arrays, mesh)
  return tuple(jnp.asarray(a) for a in arrays)


def init_pinn(config, rng):
  """Create the PINN model + initialized variables.

  init is jitted: eager flax init compiles every primitive separately
  (minutes for the FlowNet cascade); one jitted program takes seconds."""
  model = PINN(config)
  size = config.data.image_size
  B = 2
  f = jnp.zeros((B, size, size, config.data.num_channels))
  xy = jnp.zeros((B, size, size, 1))
  t = jnp.zeros((B,))
  init_fn = jax.jit(lambda r: model.init(r, f, f, xy, xy, t, train=False))
  variables = init_fn(rng)
  return model, variables


def _run_phase(config, model, state, step_fn_pair, mask_it, train_iter,
               eval_iter, writer, start_step, end_step, ckpt_dirs, tag,
               rng, mesh=None):
  train_step_fn, eval_step_fn = step_fn_pair
  checkpoint_dir, checkpoint_meta_dir = ckpt_dirs
  is_main = jax.process_index() == 0

  for step in range(start_step, end_step + 1):
    batch = unbatch(next(train_iter), mesh)
    mask = jnp.asarray(mask_it.next())
    if mesh is not None:
      mask = mesh_lib.replicate(mask, mesh)
    rng, step_rng = jax.random.split(rng)
    state, (loss, l_a, l_b) = train_step_fn(step_rng, state, mask, batch)

    if step % config.training.log_freq == 0 and is_main:
      logging.info("step: %d, %s_loss: %.5e = (%.5e, %.5e)",
                   step, tag, float(loss), float(l_a), float(l_b))
      writer.add_scalar(f"training_{tag}_loss_a", float(l_a), step)
      writer.add_scalar(f"training_{tag}_loss_b", float(l_b), step)

    if step % config.training.eval_freq == 0:
      eval_batch = unbatch(next(eval_iter), mesh)
      rng, eval_rng = jax.random.split(rng)
      _, (eloss, e_a, e_b) = eval_step_fn(eval_rng, state, mask, eval_batch)
      if is_main:
        logging.info("step: %d, eval_%s_loss: %.5e = (%.5e, %.5e)",
                     step, tag, float(eloss), float(e_a), float(e_b))
        writer.add_scalar(f"eval_{tag}_loss_a", float(e_a), step)
        writer.add_scalar(f"eval_{tag}_loss_b", float(e_b), step)

    if step != 0 and step % config.training.snapshot_freq_for_preemption == 0 and is_main:
      ckpt_lib.save_checkpoint(checkpoint_meta_dir, jax.device_get(state))

    if (step != 0 and step % config.training.snapshot_freq == 0) or step == end_step:
      if is_main:
        save_step = step // config.training.snapshot_freq
        ckpt_lib.save_checkpoint(
            os.path.join(checkpoint_dir, f'checkpoint_{save_step}'),
            jax.device_get(state))
        logging.info("checkpoint_%d saved", save_step)
  return state, rng


def train(config, workdir: str):
  """Two-phase PINN training (reference pinn_lib.py:26-178), batch-sharded
  over the mesh data axis (SURVEY §2.3)."""
  tb_dir = os.path.join(workdir, "tensorboard")
  os.makedirs(tb_dir, exist_ok=True)
  writer = _summary_writer(tb_dir)

  mesh = mesh_lib.create_mesh(config)
  mesh_lib.check_batch_divisible(config, mesh)
  rng = jax.random.PRNGKey(config.seed)
  rng, init_rng = jax.random.split(rng)
  model, variables = init_pinn(config, init_rng)
  mask_it = get_mask_dataset(config)

  train_ds, eval_ds = get_dataset(
      config, uniform_dequantization=config.data.uniform_dequantization)
  train_iter, eval_iter = iter(train_ds), iter(eval_ds)

  checkpoint_dir = os.path.join(workdir, "checkpoints")
  checkpoint_meta_dir = os.path.join(workdir, "checkpoints-meta", "checkpoint")
  os.makedirs(checkpoint_dir, exist_ok=True)
  os.makedirs(os.path.dirname(checkpoint_meta_dir), exist_ok=True)

  # --- Phase 1: preliminary training (pressurenet LR x 0.001) ---
  tx1 = pinn_losses.get_pinn_optimizer(config, lr_mul_pres=0.001)
  state = state_lib.create_train_state(variables['params'], tx1,
                                       config.model.ema_rate)
  state = ckpt_lib.restore_checkpoint(checkpoint_meta_dir, state, quiet=True)
  initial_step = int(state.step)
  state = mesh_lib.replicate(state, mesh)

  step_fns = (
      jax.jit(pinn_losses.get_prelim_step_fn(config, model, tx1, train=True),
              donate_argnums=(1,)),
      jax.jit(pinn_losses.get_prelim_step_fn(config, model, tx1, train=False)))
  logging.info("Starting Preliminary Training loop at step %d.", initial_step)
  state, rng = _run_phase(config, model, state, step_fns, mask_it,
                          train_iter, eval_iter, writer, initial_step,
                          config.training.n_iters,
                          (checkpoint_dir, checkpoint_meta_dir), 'prelim', rng,
                          mesh=mesh)

  # --- Phase 2: PINN regularization (fresh EMA/opt; pres LR x 0.005) ---
  tx2 = pinn_losses.get_pinn_optimizer(config, lr_mul_pres=0.005)
  state2 = state_lib.create_train_state(jax.device_get(state).params, tx2,
                                        config.model.ema_rate)
  state2 = state2.replace(step=jnp.asarray(config.training.n_iters, jnp.int32))
  meta_pinn = os.path.join(workdir, "checkpoints-meta", "checkpoint_pinn")
  state2 = ckpt_lib.restore_checkpoint(meta_pinn, state2, quiet=True)
  initial_step = int(state2.step)
  state2 = mesh_lib.replicate(state2, mesh)

  step_fns2 = (
      jax.jit(pinn_losses.get_pinn_step_fn(config, model, tx2, train=True),
              donate_argnums=(1,)),
      jax.jit(pinn_losses.get_pinn_step_fn(config, model, tx2, train=False)))
  logging.info("Starting Regularization Training loop at step %d.",
               initial_step)
  state2, rng = _run_phase(config, model, state2, step_fns2, mask_it,
                           train_iter, eval_iter, writer, initial_step,
                           config.training.n_iters + config.training.n_pinn_iters,
                           (checkpoint_dir, meta_pinn), 'pinn', rng, mesh=mesh)
  return state2


def train_bpinn(config, workdir: str, ckpt_dir: Optional[str]):
  """B-PINN posterior training with MOPED warm start
  (reference pinn_lib.py:180-258)."""
  tb_dir = os.path.join(workdir, "tensorboard")
  os.makedirs(tb_dir, exist_ok=True)
  writer = _summary_writer(tb_dir)
  mesh = mesh_lib.create_mesh(config)

  rng = jax.random.PRNGKey(config.seed + 7)
  rng, init_rng = jax.random.split(rng)
  model, variables = init_pinn(config, init_rng)

  # MOPED bootstrap from the deterministic PINN checkpoint
  # (reference utils.restore_bpinn_checkpoint, utils.py:62-92).
  pinn_params = variables['params']
  pretrained = False
  if ckpt_dir and os.path.exists(ckpt_dir):
    tx_probe = pinn_losses.get_pinn_optimizer(config)
    template = state_lib.create_train_state(pinn_params, tx_probe,
                                            config.model.ema_rate)
    restored = ckpt_lib.restore_checkpoint(ckpt_dir, template)
    pinn_params = restored.ema_params
    pretrained = True
  bparams = bayes.make_bpinn_params(pinn_params, config, pretrained=pretrained)

  tx = pinn_losses.get_pinn_optimizer(config, lr_mul_pres=0.05, is_bpinn=True)
  state = state_lib.create_train_state(bparams, tx, config.model.ema_rate)

  checkpoint_dir = os.path.join(workdir, "checkpoints")
  checkpoint_meta_dir = os.path.join(workdir, "checkpoints-meta", "checkpoint")
  os.makedirs(checkpoint_dir, exist_ok=True)
  os.makedirs(os.path.dirname(checkpoint_meta_dir), exist_ok=True)
  state = ckpt_lib.restore_checkpoint(checkpoint_meta_dir, state, quiet=True)
  initial_step = int(state.step)
  state = mesh_lib.replicate(state, mesh)

  mask_it = get_mask_dataset(config)
  train_ds, eval_ds = get_dataset(
      config, uniform_dequantization=config.data.uniform_dequantization)
  train_iter, eval_iter = iter(train_ds), iter(eval_ds)

  step_fns = (
      jax.jit(bayes.get_bpinn_prelim_step_fn(config, model, tx, train=True),
              donate_argnums=(1,)),
      jax.jit(bayes.get_bpinn_prelim_step_fn(config, model, tx, train=False)))
  logging.info("Starting B-PINN Training loop at step %d.", initial_step)
  state, rng = _run_phase(config, model, state, step_fns, mask_it,
                          train_iter, eval_iter, writer, initial_step,
                          config.training.n_bpinn_iters,
                          (checkpoint_dir, checkpoint_meta_dir), 'bpinn', rng,
                          mesh=mesh)
  return state
