"""Fused bias + (leaky)ReLU x scale (reference: op/fused_bias_act_kernel.cu,
CPU-fallback spec op/fused_act.py:87-97).

On TPU this is a pure elementwise chain that XLA fuses into the surrounding
op (typically the producing matmul/conv epilogue) — no custom kernel needed,
and ``jax.grad`` composes to the 1st/2nd-order gradients the reference's
``act*10+grad`` CUDA switch implements by hand.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


def fused_leaky_relu(x: Array, bias: Array, negative_slope: float = 0.2,
                     scale: float = 2 ** 0.5) -> Array:
  """leaky_relu(x + bias) * scale; bias broadcast over the channel axis.

  NHWC: bias has shape (C,) and broadcasts on the last axis (the reference's
  NCHW view-gymnastics, op/fused_act.py:88-92, become a plain add).
  """
  return jax.nn.leaky_relu(x + bias, negative_slope) * scale


def fused_bias_act(x: Array, bias: Array | None = None, act: str = 'linear',
                   alpha: float = 0.2, gain: float = 1.0) -> Array:
  """General fused bias+activation surface (reference fused_bias_act op)."""
  if bias is not None:
    x = x + bias
  if act == 'linear':
    pass
  elif act == 'relu':
    x = jax.nn.relu(x)
  elif act == 'lrelu':
    x = jax.nn.leaky_relu(x, alpha)
  else:
    raise NotImplementedError(f'act {act} unknown')
  return x * gain


class FusedLeakyReLU(nn.Module):
  """Module with a learned channel bias (reference op/fused_act.py:74-85)."""
  channel: int
  negative_slope: float = 0.2
  scale: float = 2 ** 0.5

  @nn.compact
  def __call__(self, x):
    bias = self.param('bias', nn.initializers.zeros, (self.channel,))
    return fused_leaky_relu(x, bias, self.negative_slope, self.scale)
