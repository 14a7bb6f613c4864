"""Standalone EMA helper with the reference's API surface
(reference: models/ema.py:10-98).

The framework keeps EMA parameters inside the TrainState pytree
(train/state.py) — one fused XLA update per step.  This class exists for
API parity with the reference's ``ExponentialMovingAverage`` for users who
manage params manually.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


class ExponentialMovingAverage:
  """Maintains an EMA of a params pytree (reference models/ema.py)."""

  def __init__(self, params: Any, decay: float, use_num_updates: bool = True):
    if decay < 0.0 or decay > 1.0:
      raise ValueError('Decay must be between 0 and 1')
    self.decay = decay
    self.num_updates = 0 if use_num_updates else None
    self.shadow_params = jax.tree_util.tree_map(jnp.array, params)
    self.collected_params: Optional[Any] = None

  def update(self, params: Any):
    """EMA step with warmup-aware decay (reference ema.py:44-46)."""
    decay = self.decay
    if self.num_updates is not None:
      self.num_updates += 1
      decay = min(decay, (1 + self.num_updates) / (10 + self.num_updates))
    one_minus = 1.0 - decay
    self.shadow_params = jax.tree_util.tree_map(
        lambda s, p: s - one_minus * (s - p), self.shadow_params, params)

  def copy_to(self, params: Any) -> Any:
    """Return the EMA params (functional; jax params are immutable)."""
    del params
    return self.shadow_params

  def store(self, params: Any):
    self.collected_params = jax.tree_util.tree_map(jnp.array, params)

  def restore(self, params: Any) -> Any:
    del params
    return self.collected_params

  def state_dict(self):
    return dict(decay=self.decay, num_updates=self.num_updates,
                shadow_params=self.shadow_params)

  def load_state_dict(self, state_dict):
    self.decay = state_dict['decay']
    self.num_updates = state_dict['num_updates']
    self.shadow_params = state_dict['shadow_params']
