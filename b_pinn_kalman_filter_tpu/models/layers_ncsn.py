"""NCSNv1/v2 building blocks in flax, NHWC (reference: models/layers.py
CRP/RCU/MSF/Refine family :123-336, ConvMeanPool etc :339-379,
ResidualBlock :438-492).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from b_pinn_kalman_filter_tpu.ops.grid_sample import grid_sample_2d


def ncsn_conv_init(init_scale: float = 1.0):
  """torch Conv2d default (kaiming-uniform) scaled by init_scale
  (reference ncsn_conv3x3, layers.py:104-110)."""
  init_scale = 1e-10 if init_scale == 0 else init_scale
  base = nn.initializers.variance_scaling(1.0 / 3.0, 'fan_in', 'uniform')

  def init(key, shape, dtype=jnp.float32):
    return base(key, shape, dtype) * init_scale

  return init


class NCSNConv(nn.Module):
  """3x3 (or kxk) conv with torch-default init (reference ncsn_conv3x3)."""
  out_ch: int
  kernel: int = 3
  stride: int = 1
  bias: bool = True
  dilation: int = 1
  init_scale: float = 1.0

  @nn.compact
  def __call__(self, x):
    pad = self.dilation * (self.kernel // 2)
    return nn.Conv(self.out_ch, (self.kernel, self.kernel),
                   strides=(self.stride, self.stride),
                   padding=[(pad, pad), (pad, pad)],
                   kernel_dilation=(self.dilation, self.dilation),
                   use_bias=self.bias,
                   kernel_init=ncsn_conv_init(self.init_scale),
                   bias_init=nn.initializers.zeros)(x)


def interpolate_bilinear(x: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
  """Bilinear resize with align_corners=True (torch F.interpolate semantics
  used by MSFBlock, reference layers.py:238)."""
  B, H, W, C = x.shape
  Ho, Wo = shape
  xs = jnp.linspace(-1.0, 1.0, Wo)
  ys = jnp.linspace(-1.0, 1.0, Ho)
  gx, gy = jnp.meshgrid(xs, ys)
  grid = jnp.broadcast_to(jnp.stack([gx, gy], -1), (B, Ho, Wo, 2))
  return grid_sample_2d(x, grid, padding_mode='border', align_corners=True)


class ConvMeanPool(nn.Module):
  """Conv then 2x mean-pool (reference layers.py:339-354)."""
  out_ch: int
  kernel: int = 3
  biases: bool = True
  adjust_padding: bool = False

  @nn.compact
  def __call__(self, x):
    if self.adjust_padding:
      x = jnp.pad(x, [(0, 0), (1, 0), (1, 0), (0, 0)])
    out = NCSNConv(self.out_ch, kernel=self.kernel, bias=self.biases)(x)
    return (out[:, ::2, ::2] + out[:, 1::2, ::2]
            + out[:, ::2, 1::2] + out[:, 1::2, 1::2]) / 4.


class MeanPoolConv(nn.Module):
  """2x mean-pool then conv (reference layers.py:357-366)."""
  out_ch: int
  kernel: int = 3
  biases: bool = True

  @nn.compact
  def __call__(self, x):
    out = (x[:, ::2, ::2] + x[:, 1::2, ::2]
           + x[:, ::2, 1::2] + x[:, 1::2, 1::2]) / 4.
    return NCSNConv(self.out_ch, kernel=self.kernel, bias=self.biases)(out)


class UpsampleConv(nn.Module):
  """Pixel-shuffle x2 upsample then conv (reference layers.py:369-379)."""
  out_ch: int
  kernel: int = 3
  biases: bool = True

  @nn.compact
  def __call__(self, x):
    B, H, W, C = x.shape
    # Concatenate 4 copies channel-wise then depth-to-space (NHWC analog of
    # torch cat + PixelShuffle).
    out = jnp.tile(x, (1, 1, 1, 4))
    out = out.reshape(B, H, W, 2, 2, C)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, C)
    return NCSNConv(self.out_ch, kernel=self.kernel, bias=self.biases)(out)


class CRPBlock(nn.Module):
  """Chained residual pooling (reference layers.py:123-144)."""
  features: int
  n_stages: int
  act: Callable = jax.nn.relu
  maxpool: bool = True

  @nn.compact
  def __call__(self, x):
    x = self.act(x)
    path = x
    for _ in range(self.n_stages):
      if self.maxpool:
        path = nn.max_pool(path, (5, 5), strides=(1, 1), padding='SAME')
      else:
        path = nn.avg_pool(path, (5, 5), strides=(1, 1), padding='SAME')
      path = NCSNConv(self.features, bias=False)(path)
      x = path + x
    return x


class CondCRPBlock(nn.Module):
  """Conditional CRP (reference layers.py:147-170)."""
  features: int
  n_stages: int
  normalizer: Any
  act: Callable = jax.nn.relu

  @nn.compact
  def __call__(self, x, y):
    x = self.act(x)
    path = x
    for _ in range(self.n_stages):
      path = self.normalizer(bias=True)(path, y)
      path = nn.avg_pool(path, (5, 5), strides=(1, 1), padding='SAME')
      path = NCSNConv(self.features, bias=False)(path)
      x = path + x
    return x


class RCUBlock(nn.Module):
  """Residual conv unit (reference layers.py:173-194)."""
  features: int
  n_blocks: int
  n_stages: int
  act: Callable = jax.nn.relu

  @nn.compact
  def __call__(self, x):
    for _ in range(self.n_blocks):
      residual = x
      for _ in range(self.n_stages):
        x = self.act(x)
        x = NCSNConv(self.features, bias=False)(x)
      x = x + residual
    return x


class CondRCUBlock(nn.Module):
  """Conditional RCU (reference layers.py:197-221)."""
  features: int
  n_blocks: int
  n_stages: int
  normalizer: Any
  act: Callable = jax.nn.relu

  @nn.compact
  def __call__(self, x, y):
    for _ in range(self.n_blocks):
      residual = x
      for _ in range(self.n_stages):
        x = self.normalizer(bias=True)(x, y)
        x = self.act(x)
        x = NCSNConv(self.features, bias=False)(x)
      x = x + residual
    return x


class MSFBlock(nn.Module):
  """Multi-scale fusion (reference layers.py:224-240)."""
  features: int

  @nn.compact
  def __call__(self, xs, shape):
    total = jnp.zeros((xs[0].shape[0], shape[0], shape[1], self.features),
                      xs[0].dtype)
    for i in range(len(xs)):
      h = NCSNConv(self.features, bias=True)(xs[i])
      h = interpolate_bilinear(h, shape)
      total = total + h
    return total


class CondMSFBlock(nn.Module):
  """Conditional MSF (reference layers.py:243-264)."""
  features: int
  normalizer: Any

  @nn.compact
  def __call__(self, xs, y, shape):
    total = jnp.zeros((xs[0].shape[0], shape[0], shape[1], self.features),
                      xs[0].dtype)
    for i in range(len(xs)):
      h = self.normalizer(bias=True)(xs[i], y)
      h = NCSNConv(self.features, bias=True)(h)
      h = interpolate_bilinear(h, shape)
      total = total + h
    return total


class RefineBlock(nn.Module):
  """RefineNet block (reference layers.py:267-300)."""
  features: int
  n_inputs: int
  act: Callable = jax.nn.relu
  start: bool = False
  end: bool = False
  maxpool: bool = True

  @nn.compact
  def __call__(self, xs, output_shape):
    assert len(xs) == self.n_inputs
    hs = [RCUBlock(xs[i].shape[-1], 2, 2, self.act)(xs[i])
          for i in range(len(xs))]
    if self.n_inputs > 1:
      h = MSFBlock(self.features)(hs, output_shape)
    else:
      h = hs[0]
    h = CRPBlock(self.features, 2, self.act, maxpool=self.maxpool)(h)
    return RCUBlock(self.features, 3 if self.end else 1, 2, self.act)(h)


class CondRefineBlock(nn.Module):
  """Conditional RefineNet block (reference layers.py:303-336)."""
  features: int
  n_inputs: int
  normalizer: Any
  act: Callable = jax.nn.relu
  start: bool = False
  end: bool = False

  @nn.compact
  def __call__(self, xs, y, output_shape):
    assert len(xs) == self.n_inputs
    hs = [CondRCUBlock(xs[i].shape[-1], 2, 2, self.normalizer, self.act)(xs[i], y)
          for i in range(len(xs))]
    if self.n_inputs > 1:
      h = CondMSFBlock(self.features, self.normalizer)(hs, y, output_shape)
    else:
      h = hs[0]
    h = CondCRPBlock(self.features, 2, self.normalizer, self.act)(h, y)
    return CondRCUBlock(self.features, 3 if self.end else 1, 2,
                        self.normalizer, self.act)(h, y)


class ResidualBlock(nn.Module):
  """NCSN residual block (reference layers.py:438-492)."""
  output_dim: int
  normalization: Any
  resample: Optional[str] = None
  act: Callable = jax.nn.elu
  adjust_padding: bool = False
  dilation: int = 1

  @nn.compact
  def __call__(self, x):
    input_dim = x.shape[-1]
    norm = self.normalization
    h = norm()(x)
    h = self.act(h)
    if self.resample == 'down':
      if self.dilation > 1:
        h = NCSNConv(input_dim, dilation=self.dilation)(h)
        h = norm()(h)
        h = self.act(h)
        h = NCSNConv(self.output_dim, dilation=self.dilation)(h)
        shortcut = NCSNConv(self.output_dim, dilation=self.dilation)(x)
      else:
        h = NCSNConv(input_dim)(h)
        h = norm()(h)
        h = self.act(h)
        h = ConvMeanPool(self.output_dim, 3, adjust_padding=self.adjust_padding)(h)
        shortcut = ConvMeanPool(self.output_dim, 1,
                                adjust_padding=self.adjust_padding)(x)
    elif self.resample is None:
      h = NCSNConv(self.output_dim, dilation=self.dilation)(h)
      h = norm()(h)
      h = self.act(h)
      h = NCSNConv(self.output_dim, dilation=self.dilation)(h)
      if self.output_dim == input_dim:
        shortcut = x
      elif self.dilation > 1:
        shortcut = NCSNConv(self.output_dim, dilation=self.dilation)(x)
      else:
        shortcut = NCSNConv(self.output_dim, kernel=1)(x)
    else:
      raise Exception('invalid resample value')

    return shortcut + h


class ConditionalResidualBlock(nn.Module):
  """Class-conditional NCSN residual block (reference layers.py:382-435)."""
  output_dim: int
  normalization: Any
  resample: Optional[str] = None
  act: Callable = jax.nn.elu
  adjust_padding: bool = False
  dilation: int = 1

  @nn.compact
  def __call__(self, x, y):
    input_dim = x.shape[-1]
    norm = self.normalization
    h = norm()(x, y)
    h = self.act(h)
    if self.resample == 'down':
      if self.dilation > 1:
        h = NCSNConv(input_dim, dilation=self.dilation)(h)
        h = norm()(h, y)
        h = self.act(h)
        h = NCSNConv(self.output_dim, dilation=self.dilation)(h)
        shortcut = NCSNConv(self.output_dim, dilation=self.dilation)(x)
      else:
        h = NCSNConv(input_dim)(h)
        h = norm()(h, y)
        h = self.act(h)
        h = ConvMeanPool(self.output_dim, 3, adjust_padding=self.adjust_padding)(h)
        shortcut = ConvMeanPool(self.output_dim, 1,
                                adjust_padding=self.adjust_padding)(x)
    elif self.resample is None:
      h = NCSNConv(self.output_dim, dilation=self.dilation)(h)
      h = norm()(h, y)
      h = self.act(h)
      h = NCSNConv(self.output_dim, dilation=self.dilation)(h)
      if self.output_dim == input_dim:
        shortcut = x
      elif self.dilation > 1:
        shortcut = NCSNConv(self.output_dim, dilation=self.dilation)(x)
      else:
        shortcut = nn.Conv(self.output_dim, (1, 1))(x)
    else:
      raise Exception('invalid resample value')

    return shortcut + h
