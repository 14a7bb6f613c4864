"""Train state: params + optimizer + EMA in one jit-donatable pytree.

Replaces the reference's mutable dict state {'model','optimizer','ema','step'}
(reference: run_lib.py:84-88) and its ExponentialMovingAverage class
(reference: models/ema.py:10-98).  EMA params live *inside* the pytree, so
the whole train step — fwd, bwd, optimizer, EMA — is a single fused XLA
program with donated buffers (zero-copy state update).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
  step: jax.Array                 # scalar int32
  params: Any
  opt_state: Any
  ema_params: Any
  ema_rate: float = flax.struct.field(pytree_node=False, default=0.999)


def ema_decay(state_step: jax.Array, rate: float) -> jax.Array:
  """Warmup-aware EMA decay (reference models/ema.py:44-46 semantics):
  decay = min(rate, (1 + n_updates) / (10 + n_updates))."""
  n = state_step.astype(jnp.float32)
  return jnp.minimum(rate, (1.0 + n) / (10.0 + n))


def ema_update(state: TrainState, new_params) -> Any:
  """One EMA step over the params pytree."""
  decay = ema_decay(state.step, state.ema_rate)
  one_minus = 1.0 - decay
  return jax.tree_util.tree_map(
      lambda e, p: e - one_minus * (e - p), state.ema_params, new_params)


def create_train_state(params, tx: optax.GradientTransformation,
                       ema_rate: float) -> TrainState:
  return TrainState(
      step=jnp.zeros((), jnp.int32),
      params=params,
      opt_state=tx.init(params),
      ema_params=jax.tree_util.tree_map(jnp.array, params),
      ema_rate=float(ema_rate),
  )
