"""StyleGAN2-style FIR resampling built on upfirdn2d
(reference: models/up_or_down_sampling.py), NHWC.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from b_pinn_kalman_filter_tpu.ops.upfirdn2d import setup_kernel, upfirdn2d

Array = jax.Array


def naive_upsample_2d(x: Array, factor: int = 2) -> Array:
  B, H, W, C = x.shape
  x = x.reshape(B, H, 1, W, 1, C)
  x = jnp.tile(x, (1, 1, factor, 1, factor, 1))
  return x.reshape(B, H * factor, W * factor, C)


def naive_downsample_2d(x: Array, factor: int = 2) -> Array:
  B, H, W, C = x.shape
  x = x.reshape(B, H // factor, factor, W // factor, factor, C)
  return jnp.mean(x, axis=(2, 4))


def upsample_2d(x: Array, k: Optional[Sequence] = None, factor: int = 2,
                gain: float = 1.0) -> Array:
  """FIR upsample (reference up_or_down_sampling.py:195-224)."""
  assert isinstance(factor, int) and factor >= 1
  if k is None:
    k = [1] * factor
  k = setup_kernel(k) * (gain * (factor ** 2))
  p = k.shape[0] - factor
  return upfirdn2d(x, jnp.asarray(k), up=factor,
                   pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x: Array, k: Optional[Sequence] = None, factor: int = 2,
                  gain: float = 1.0) -> Array:
  """FIR downsample (reference up_or_down_sampling.py:227-257)."""
  assert isinstance(factor, int) and factor >= 1
  if k is None:
    k = [1] * factor
  k = setup_kernel(k) * gain
  p = k.shape[0] - factor
  return upfirdn2d(x, jnp.asarray(k), down=factor,
                   pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(x: Array, w: Array, k: Optional[Sequence] = None,
                     factor: int = 2, gain: float = 1.0) -> Array:
  """Fused transpose-conv upsample + FIR
  (reference up_or_down_sampling.py:72-141).  ``w`` is HWIO."""
  assert isinstance(factor, int) and factor >= 1
  convH, convW, inC, outC = w.shape
  assert convW == convH
  w = w.astype(x.dtype)
  if k is None:
    k = [1] * factor
  k = setup_kernel(k) * (gain * (factor ** 2))
  p = (k.shape[0] - factor) - (convW - 1)

  # transpose_kernel=False: correlate the zero-stuffed input with w itself —
  # the net semantics of the reference's flip-permute-conv_transpose dance
  # (up_or_down_sampling.py:124-129).
  x = jax.lax.conv_transpose(
      x, w, strides=(factor, factor), padding='VALID',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'), transpose_kernel=False)
  return upfirdn2d(x, jnp.asarray(k),
                   pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def conv_downsample_2d(x: Array, w: Array, k: Optional[Sequence] = None,
                       factor: int = 2, gain: float = 1.0) -> Array:
  """Fused FIR + strided conv downsample
  (reference up_or_down_sampling.py:144-178).  ``w`` is HWIO."""
  assert isinstance(factor, int) and factor >= 1
  convH, convW, inC, outC = w.shape
  assert convW == convH
  w = w.astype(x.dtype)
  if k is None:
    k = [1] * factor
  k = setup_kernel(k) * gain
  p = (k.shape[0] - factor) + (convW - 1)
  x = upfirdn2d(x, jnp.asarray(k), pad=((p + 1) // 2, p // 2))
  return jax.lax.conv_general_dilated(
      x, w, window_strides=(factor, factor), padding='VALID',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class Conv2d(nn.Module):
  """Conv with optional fused FIR up/downsampling
  (reference up_or_down_sampling.py:23-56)."""
  out_ch: int
  kernel: int
  up: bool = False
  down: bool = False
  resample_kernel: Sequence[int] = (1, 3, 3, 1)
  use_bias: bool = True
  kernel_init: Optional[nn.initializers.Initializer] = None

  @nn.compact
  def __call__(self, x):
    assert not (self.up and self.down)
    assert self.kernel >= 1 and self.kernel % 2 == 1
    init = self.kernel_init or nn.initializers.zeros
    w = self.param('weight', init,
                   (self.kernel, self.kernel, x.shape[-1], self.out_ch))
    if self.up:
      x = upsample_conv_2d(x, w, k=self.resample_kernel)
    elif self.down:
      x = conv_downsample_2d(x, w, k=self.resample_kernel)
    else:
      x = jax.lax.conv_general_dilated(
          x, w.astype(x.dtype), window_strides=(1, 1), padding='SAME',
          dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if self.use_bias:
      b = self.param('bias', nn.initializers.zeros, (self.out_ch,))
      x = x + b.astype(x.dtype)
    return x
