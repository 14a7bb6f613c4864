"""NCSN++ layers in flax (reference: models/layerspp.py), NHWC.

Attention uses MXU-friendly (B, HW, C) batched matmuls rather than the
reference's (B,H,W,H*W) einsum (layerspp.py:82-86) — same math, HBM-sane
at 256^2 (SURVEY §5 long-context note).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from b_pinn_kalman_filter_tpu.models import layers
from b_pinn_kalman_filter_tpu.ops import resample

Conv1x1 = layers.Conv1x1
Conv3x3 = layers.Conv3x3
NIN = layers.NIN
default_init = layers.default_init


def _gn(ch: int, dtype=jnp.float32):
  return nn.GroupNorm(num_groups=max(min(ch // 4, 32), 1), epsilon=1e-6,
                      dtype=dtype)


def _norm_act(x, act, dtype, fused: bool, name: str):
  """act(GroupNorm(x)) with optional fused Pallas dispatch
  (layers.norm_act with the NCSN++ group-count formula)."""
  ch = x.shape[-1]
  return layers.norm_act(x, act, max(min(ch // 4, 32), 1), dtype, fused,
                         name=name)


class GaussianFourierProjection(nn.Module):
  """Gaussian Fourier features for noise levels (reference layerspp.py:32-41).
  W is a fixed (non-trainable) random projection."""
  embedding_size: int = 256
  scale: float = 1.0

  @nn.compact
  def __call__(self, x):
    W = self.variable(
        'params', 'W',
        lambda: jax.random.normal(self.make_rng('params'),
                                  (self.embedding_size,)) * self.scale).value
    W = jax.lax.stop_gradient(W)
    x_proj = x[:, None] * W[None, :] * 2 * np.pi
    return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class Combine(nn.Module):
  """Combine skip-pyramid information (reference layerspp.py:44-59)."""
  dim2: int
  method: str = 'cat'

  @nn.compact
  def __call__(self, x, y):
    h = Conv1x1(self.dim2)(x)
    if self.method == 'cat':
      return jnp.concatenate([h, y], axis=-1)
    elif self.method == 'sum':
      return h + y
    else:
      raise ValueError(f'Method {self.method} not recognized.')


class AttnBlockpp(nn.Module):
  """Self-attention block, NCSN++ flavor (reference layerspp.py:62-91)."""
  skip_rescale: bool = False
  init_scale: float = 0.
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x):
    B, H, W, C = x.shape
    h = _gn(C, self.dtype)(x)
    q = NIN(C, dtype=self.dtype)(h).reshape(B, H * W, C)
    k = NIN(C, dtype=self.dtype)(h).reshape(B, H * W, C)
    v = NIN(C, dtype=self.dtype)(h).reshape(B, H * W, C)
    w = jnp.einsum('bqc,bkc->bqk', q, k,
                   preferred_element_type=jnp.float32) * (int(C) ** -0.5)
    w = jax.nn.softmax(w, axis=-1)
    h = jnp.einsum('bqk,bkc->bqc', w, v,
                   preferred_element_type=jnp.float32).reshape(B, H, W, C)
    h = NIN(C, init_scale=self.init_scale, dtype=self.dtype)(h.astype(self.dtype))
    if not self.skip_rescale:
      return x + h
    return (x + h) / np.sqrt(2.)


class Upsample(nn.Module):
  """x2 upsample, optionally FIR / conv (reference layerspp.py:94-126)."""
  out_ch: Optional[int] = None
  with_conv: bool = False
  fir: bool = False
  fir_kernel: Sequence[int] = (1, 3, 3, 1)

  @nn.compact
  def __call__(self, x):
    B, H, W, C = x.shape
    out_ch = self.out_ch if self.out_ch else C
    if not self.fir:
      h = layers.naive_upsample_2d(x, 2)
      if self.with_conv:
        h = Conv3x3(out_ch)(h)
    else:
      if not self.with_conv:
        h = resample.upsample_2d(x, self.fir_kernel, factor=2)
      else:
        h = resample.Conv2d(out_ch, kernel=3, up=True,
                            resample_kernel=self.fir_kernel,
                            use_bias=True, kernel_init=default_init())(x)
    return h


class Downsample(nn.Module):
  """x2 downsample, optionally FIR / conv (reference layerspp.py:129-163)."""
  out_ch: Optional[int] = None
  with_conv: bool = False
  fir: bool = False
  fir_kernel: Sequence[int] = (1, 3, 3, 1)

  @nn.compact
  def __call__(self, x):
    B, H, W, C = x.shape
    out_ch = self.out_ch if self.out_ch else C
    if not self.fir:
      if self.with_conv:
        x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
        x = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding='VALID',
                    kernel_init=default_init(),
                    bias_init=nn.initializers.zeros)(x)
      else:
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
    else:
      if not self.with_conv:
        x = resample.downsample_2d(x, self.fir_kernel, factor=2)
      else:
        x = resample.Conv2d(out_ch, kernel=3, down=True,
                            resample_kernel=self.fir_kernel,
                            use_bias=True, kernel_init=default_init())(x)
    return x


class ResnetBlockDDPMpp(nn.Module):
  """DDPM-style ResBlock for NCSN++ (reference layerspp.py:166-209)."""
  act: Callable
  out_ch: Optional[int] = None
  conv_shortcut: bool = False
  dropout: float = 0.1
  skip_rescale: bool = False
  init_scale: float = 0.
  dtype: Any = jnp.float32
  fused_gn: bool = False

  @nn.compact
  def __call__(self, x, temb=None, train=True):
    C = x.shape[-1]
    out_ch = self.out_ch if self.out_ch else C
    h = _norm_act(x, self.act, self.dtype, self.fused_gn, 'GroupNorm_0')
    h = Conv3x3(out_ch, dtype=self.dtype)(h)
    if temb is not None:
      h += nn.Dense(out_ch, kernel_init=default_init(),
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype)(self.act(temb))[:, None, None, :]
    h = _norm_act(h, self.act, self.dtype, self.fused_gn, 'GroupNorm_1')
    h = nn.Dropout(self.dropout)(h, deterministic=not train)
    h = Conv3x3(out_ch, init_scale=self.init_scale, dtype=self.dtype)(h)
    if C != out_ch:
      if self.conv_shortcut:
        x = Conv3x3(out_ch, dtype=self.dtype)(x)
      else:
        x = NIN(out_ch, dtype=self.dtype)(x)
    if not self.skip_rescale:
      return x + h
    return (x + h) / np.sqrt(2.)


class ResnetBlockBigGANpp(nn.Module):
  """BigGAN-style ResBlock with in-block resampling
  (reference layerspp.py:212-274)."""
  act: Callable
  out_ch: Optional[int] = None
  up: bool = False
  down: bool = False
  dropout: float = 0.1
  fir: bool = False
  fir_kernel: Sequence[int] = (1, 3, 3, 1)
  skip_rescale: bool = True
  init_scale: float = 0.
  dtype: Any = jnp.float32
  fused_gn: bool = False

  @nn.compact
  def __call__(self, x, temb=None, train=True):
    C = x.shape[-1]
    out_ch = self.out_ch if self.out_ch else C
    h = _norm_act(x, self.act, self.dtype, self.fused_gn, 'GroupNorm_0')

    if self.up:
      if self.fir:
        h = resample.upsample_2d(h, self.fir_kernel, factor=2)
        x = resample.upsample_2d(x, self.fir_kernel, factor=2)
      else:
        h = layers.naive_upsample_2d(h, 2)
        x = layers.naive_upsample_2d(x, 2)
    elif self.down:
      if self.fir:
        h = resample.downsample_2d(h, self.fir_kernel, factor=2)
        x = resample.downsample_2d(x, self.fir_kernel, factor=2)
      else:
        h = layers.naive_downsample_2d(h, 2)
        x = layers.naive_downsample_2d(x, 2)

    h = Conv3x3(out_ch, dtype=self.dtype)(h)
    if temb is not None:
      h += nn.Dense(out_ch, kernel_init=default_init(),
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype)(self.act(temb))[:, None, None, :]
    h = _norm_act(h, self.act, self.dtype, self.fused_gn, 'GroupNorm_1')
    h = nn.Dropout(self.dropout)(h, deterministic=not train)
    h = Conv3x3(out_ch, init_scale=self.init_scale, dtype=self.dtype)(h)

    if C != out_ch or self.up or self.down:
      x = Conv1x1(out_ch, dtype=self.dtype)(x)

    if not self.skip_rescale:
      return x + h
    return (x + h) / np.sqrt(2.)
