"""Checkpoint I/O with orbax (reference: utils.py:25-128).

Keeps the reference's two-tier layout: numbered snapshots
``checkpoints/checkpoint_N`` plus a preemption-resume meta checkpoint
``checkpoints-meta/checkpoint`` that is auto-restored at startup
(reference run_lib.py:86-91, utils.py:39-60).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
from absl import logging

import orbax.checkpoint as ocp


def _checkpointer():
  return ocp.StandardCheckpointer()


def save_checkpoint(path: str, state: Any):
  """Save a pytree state (overwrites; reference utils.py:109-128)."""
  path = os.path.abspath(path)
  ckptr = _checkpointer()
  ckptr.save(path, state, force=True)
  ckptr.wait_until_finished()


def restore_checkpoint(path: str, state: Any, quiet: bool = False) -> Any:
  """Restore into the template ``state``; returns ``state`` unchanged when no
  checkpoint exists (reference utils.py:39-60 semantics)."""
  path = os.path.abspath(path)
  if not os.path.exists(path):
    if not quiet:
      logging.warning(
          'No checkpoint found at %s. Returned the same state as input', path)
    return state
  abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state)
  return _checkpointer().restore(path, abstract)


def load_checkpoint(path: str, state: Any) -> Any:
  """Alias with the reference's name (reference utils.py:98-106)."""
  return restore_checkpoint(path, state)


def latest_checkpoint_step(checkpoint_dir: str) -> Optional[int]:
  """Highest N among checkpoint_N under ``checkpoint_dir``."""
  if not os.path.isdir(checkpoint_dir):
    return None
  steps = []
  for name in os.listdir(checkpoint_dir):
    if name.startswith('checkpoint_'):
      try:
        steps.append(int(name.split('_')[-1]))
      except ValueError:
        pass
  return max(steps) if steps else None


def restore_bpinn_checkpoint(pinn_ckpt_dir: str, meta_dir: str, bpinn_state,
                             config):
  """PINN -> B-PINN MOPED bootstrap restore (reference utils.py:62-92):
  prefer the B-PINN meta checkpoint when present; otherwise build the MOPED
  posterior from the deterministic PINN checkpoint."""
  import jax

  from b_pinn_kalman_filter_tpu.pinn import bayes

  if os.path.exists(os.path.abspath(meta_dir)):
    return restore_checkpoint(meta_dir, bpinn_state)
  if pinn_ckpt_dir and os.path.exists(os.path.abspath(pinn_ckpt_dir)):
    # The posterior mu tree has the PINN params' structure.
    mu_template = {k: bpinn_state.params[k]['mu'] for k in bpinn_state.params}
    from b_pinn_kalman_filter_tpu.pinn import losses as pinn_losses
    from b_pinn_kalman_filter_tpu.train import state as state_lib
    tx = pinn_losses.get_pinn_optimizer(config)
    template = state_lib.create_train_state(mu_template, tx,
                                            config.model.ema_rate)
    restored = restore_checkpoint(pinn_ckpt_dir, template)
    bparams = bayes.make_bpinn_params(restored.ema_params, config,
                                      pretrained=True)
    return bpinn_state.replace(
        params=bparams,
        ema_params=jax.tree_util.tree_map(lambda x: x, bparams))
  return bpinn_state


def get_ckptdir(workdir: str, name: str = 'checkpoints') -> str:
  path = os.path.join(workdir, name)
  os.makedirs(path, exist_ok=True)
  return path
