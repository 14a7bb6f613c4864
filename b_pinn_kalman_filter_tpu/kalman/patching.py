"""Patch/unpatch between image fields and per-patch filter states
(reference: pinn_kalman/ukf_utils.py:8-22).

Reference layout: ``patch`` maps (B, C, H, W) -> (C*B*N, p^2) with patches
ordered (channel, batch, row-block, col-block); ``unpatch`` inverts it.
Here images are NHWC; the flat ordering is kept identical so filter states
are interchangeable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def patch(x: Array, p_size: int) -> Array:
  """(B, H, W, C) -> (C*B*N, p^2), N = (H/p)*(W/p)."""
  B, H, W, C = x.shape
  nh, nw = H // p_size, W // p_size
  x = x.transpose(3, 0, 1, 2)                    # (C, B, H, W)
  x = x.reshape(C, B, nh, p_size, nw, p_size)
  x = x.transpose(0, 1, 2, 4, 3, 5)              # (C, B, nh, nw, p, p)
  return x.reshape(-1, p_size * p_size)


def unpatch(x: Array, p_size: int, f_size: int, channel_num: int = 6) -> Array:
  """(C*B*N, p^2) -> (B, f_size, f_size, C)."""
  num = f_size // p_size
  CB = x.shape[0] // (num * num)
  B = CB // channel_num
  x = x.reshape(channel_num, B, num, num, p_size, p_size)
  x = x.transpose(1, 2, 4, 3, 5, 0)              # (B, nh, p, nw, p, C)
  return x.reshape(B, f_size, f_size, channel_num)
