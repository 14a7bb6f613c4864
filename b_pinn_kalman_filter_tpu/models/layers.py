"""Common flax layers for score networks (reference: models/layers.py).

TPU-first design notes:

* Layout is **NHWC** end-to-end — the native layout for TPU convolutions
  (the reference uses NCHW; conversion happens only at data-loading).
* Attention is standard (B, HW, C) dot-product attention feeding the MXU,
  instead of the reference's (B, H, W, H*W) einsum blowup
  (reference models/layers.py:549-573) — same math, HBM-sane.
* Initializers are `jax.nn.initializers.variance_scaling` — the reference's
  `variance_scaling` is itself "Ported from JAX" (models/layers.py:53-86),
  so this is the original, not a port.
* Compute dtype is configurable (bfloat16 on the MXU, float32 params).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array
Dtype = Any


def remat_block(cls, static_argnums=(3,)):
  """``nn.remat`` a block class without changing its flax scope names.

  ``nn.remat`` renames the wrapped class ``Checkpoint<Name>``, which changes
  auto-generated parameter paths (``ResnetBlockDDPM_0`` →
  ``CheckpointResnetBlockDDPM_0``) and would make checkpoints written with
  ``tpu.remat`` toggled incompatible.  Restoring ``__name__`` keeps the
  param tree identical either way.
  """
  wrapped = nn.remat(cls, static_argnums=static_argnums)
  wrapped.__name__ = cls.__name__
  try:
    wrapped.__qualname__ = cls.__qualname__
  except (AttributeError, TypeError):
    pass
  return wrapped


def get_act(config) -> Callable[[Array], Array]:
  """Activation from config (reference models/layers.py:29-41)."""
  name = config.model.nonlinearity.lower()
  if name == 'elu':
    return jax.nn.elu
  elif name == 'relu':
    return jax.nn.relu
  elif name == 'lrelu':
    return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
  elif name == 'swish':
    return jax.nn.silu
  else:
    raise NotImplementedError('activation function does not exist!')


class _FusedGroupNormAct(nn.Module):
  """act(GroupNorm(x)) through the fused Pallas kernel
  (ops/groupnorm_pallas.py), with nn.GroupNorm-compatible params
  ('scale'/'bias' f32) so checkpoints interchange with the direct path."""
  num_groups: int
  act_name: str
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x):
    from b_pinn_kalman_filter_tpu.ops import groupnorm_pallas
    C = x.shape[-1]
    scale = self.param('scale', nn.initializers.ones, (C,), jnp.float32)
    bias = self.param('bias', nn.initializers.zeros, (C,), jnp.float32)
    return groupnorm_pallas.groupnorm_act(
        x.astype(self.dtype), scale, bias, num_groups=self.num_groups,
        act=self.act_name, eps=1e-6,
        interpret=groupnorm_pallas.FORCE_INTERPRET)


_FUSABLE_ACTS = {jax.nn.silu: 'silu', jax.nn.elu: 'elu'}


def norm_act(x, act: Callable, num_groups: int, dtype, fused: bool,
             name: str):
  """``act(GroupNorm(x))`` with optional fused-kernel dispatch.

  ``name`` pins the child scope (e.g. 'GroupNorm_0') so the param tree is
  identical whether or not the fused path is taken.  Falls back to flax
  GroupNorm when the activation has no kernel variant or the shape misses
  the lane-alignment guard.
  """
  from b_pinn_kalman_filter_tpu.ops import groupnorm_pallas
  from b_pinn_kalman_filter_tpu.ops.backend import is_tpu_backend
  act_name = _FUSABLE_ACTS.get(act)
  if (fused and act_name is not None
      and (is_tpu_backend() or groupnorm_pallas.FORCE_INTERPRET)
      and groupnorm_pallas.fits_fused_groupnorm(x.shape, num_groups)):
    return _FusedGroupNormAct(num_groups=num_groups, act_name=act_name,
                              dtype=dtype, name=name)(x)
  return act(nn.GroupNorm(num_groups=num_groups, epsilon=1e-6,
                          dtype=dtype, name=name)(x))


def default_init(scale: float = 1.0):
  """DDPM initialization: variance_scaling(scale, fan_avg, uniform)."""
  scale = 1e-10 if scale == 0 else scale
  return jax.nn.initializers.variance_scaling(scale, 'fan_avg', 'uniform')


class _WinogradConv3x3(nn.Module):
  """Winograd F(2x2,3x3) conv with nn.Conv-compatible params ('kernel' HWIO
  f32 + 'bias'), so checkpoints are interchangeable with the direct path."""
  features: int
  use_bias: bool = True
  init_scale: float = 1.0
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x):
    from b_pinn_kalman_filter_tpu.ops import winograd
    kernel = self.param('kernel', default_init(self.init_scale),
                        (3, 3, x.shape[-1], self.features), jnp.float32)
    bias = (self.param('bias', nn.initializers.zeros,
                       (self.features,), jnp.float32)
            if self.use_bias else None)
    return winograd.conv3x3_fast(x, kernel, bias, compute_dtype=self.dtype)


class Conv3x3(nn.Module):
  """3x3 conv, DDPM init, SAME padding (reference ddpm_conv3x3, layers.py:113).

  ``winograd=True`` routes stride-1/dilation-1 calls with MXU-filling
  channel counts through the F(2x2,3x3) path (ops/winograd.py) — same
  convolution, 2.25x fewer MXU multiplies; the param tree is identical
  either way (both branches scope to 'Conv_0' with nn.Conv param names).
  """
  out_ch: int
  stride: int = 1
  bias: bool = True
  dilation: int = 1
  init_scale: float = 1.0
  dtype: Dtype = jnp.float32
  winograd: bool = False

  @nn.compact
  def __call__(self, x):
    from b_pinn_kalman_filter_tpu.ops import winograd as wg
    if self.winograd and wg.winograd_applicable(
        x.shape, (3, 3, x.shape[-1], self.out_ch), self.stride, self.dilation):
      return _WinogradConv3x3(self.out_ch, use_bias=self.bias,
                              init_scale=self.init_scale, dtype=self.dtype,
                              name='Conv_0')(x)
    return nn.Conv(self.out_ch, (3, 3), strides=(self.stride, self.stride),
                   padding='SAME', use_bias=self.bias,
                   kernel_dilation=(self.dilation, self.dilation),
                   kernel_init=default_init(self.init_scale),
                   bias_init=nn.initializers.zeros, dtype=self.dtype,
                   name='Conv_0')(x)


class Conv1x1(nn.Module):
  """1x1 conv with DDPM init (reference ddpm_conv1x1, layers.py:96)."""
  out_ch: int
  stride: int = 1
  bias: bool = True
  init_scale: float = 1.0
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x):
    return nn.Conv(self.out_ch, (1, 1), strides=(self.stride, self.stride),
                   padding='VALID', use_bias=self.bias,
                   kernel_init=default_init(self.init_scale),
                   bias_init=nn.initializers.zeros, dtype=self.dtype)(x)


def get_timestep_embedding(timesteps: Array, embedding_dim: int,
                           max_positions: int = 10000) -> Array:
  """Transformer sinusoidal timestep embedding (reference layers.py:500-514)."""
  assert timesteps.ndim == 1
  half_dim = embedding_dim // 2
  # Guard embedding_dim == 2 (half_dim - 1 == 0); the torch original
  # divides by zero there.
  emb = math.log(max_positions) / (half_dim - 1 if half_dim > 1 else 1)
  emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
  emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
  emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
  if embedding_dim % 2 == 1:
    emb = jnp.pad(emb, [(0, 0), (0, 1)])
  assert emb.shape == (timesteps.shape[0], embedding_dim)
  return emb


def get_spatial_embedding(x: Array, y: Array, omega: float, s: float = 1.0) -> Array:
  """Radial sinusoid positional field (this fork's addition; reference
  layers.py:517-521).  The sqrt is epsilon-guarded: its gradient is singular
  at the radial origin, which NaNs the PINN residual's second-order
  derivatives whenever the coordinate grid contains the exact corner point
  (the torch original has the same singularity)."""
  eps = 1e-12
  e1 = jnp.sin(omega * jnp.sqrt(x ** 2 + y ** 2 + eps))
  e2 = jnp.sin(omega * jnp.sqrt((jnp.max(x) - x) ** 2
                                + (jnp.max(y) - y) ** 2 + eps))
  return (e1 + e2) / s


class NIN(nn.Module):
  """Network-in-network: per-pixel dense over channels (reference layers.py:537-546).

  In NHWC this is a plain channel contraction — one MXU matmul.
  """
  num_units: int
  init_scale: float = 0.1
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x):
    in_dim = x.shape[-1]
    W = self.param('W', default_init(self.init_scale), (in_dim, self.num_units))
    b = self.param('b', nn.initializers.zeros, (self.num_units,))
    return jnp.tensordot(x, W.astype(self.dtype), axes=1) + b.astype(self.dtype)


class AttnBlock(nn.Module):
  """Spatial self-attention block (reference layers.py:549-573).

  Same math as the reference einsum attention, but computed as
  (B, HW, C) @ (B, C, HW) batched matmuls — MXU-friendly and avoids
  materializing a (B, H, W, H, W) tensor.
  """
  num_groups: int = 32
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x):
    B, H, W, C = x.shape
    h = nn.GroupNorm(num_groups=min(self.num_groups, C), epsilon=1e-6,
                     dtype=self.dtype)(x)
    q = NIN(C, dtype=self.dtype)(h).reshape(B, H * W, C)
    k = NIN(C, dtype=self.dtype)(h).reshape(B, H * W, C)
    v = NIN(C, dtype=self.dtype)(h).reshape(B, H * W, C)

    w = jnp.einsum('bqc,bkc->bqk', q, k,
                   preferred_element_type=jnp.float32) * (int(C) ** -0.5)
    w = jax.nn.softmax(w, axis=-1)
    h = jnp.einsum('bqk,bkc->bqc', w, v, preferred_element_type=jnp.float32)
    h = h.reshape(B, H, W, C).astype(self.dtype)
    h = NIN(C, init_scale=0., dtype=self.dtype)(h)
    return x + h


def naive_upsample_2d(x: Array, factor: int = 2) -> Array:
  """Nearest-neighbor upsample in NHWC."""
  B, H, W, C = x.shape
  x = x.reshape(B, H, 1, W, 1, C)
  x = jnp.tile(x, (1, 1, factor, 1, factor, 1))
  return x.reshape(B, H * factor, W * factor, C)


def naive_downsample_2d(x: Array, factor: int = 2) -> Array:
  """Average-pool downsample in NHWC."""
  B, H, W, C = x.shape
  x = x.reshape(B, H // factor, factor, W // factor, factor, C)
  return jnp.mean(x, axis=(2, 4))


class Upsample(nn.Module):
  """Nearest x2 upsample, optional conv (reference layers.py:576-588)."""
  with_conv: bool = False
  dtype: Dtype = jnp.float32
  winograd: bool = False

  @nn.compact
  def __call__(self, x):
    h = naive_upsample_2d(x, 2)
    if self.with_conv:
      h = Conv3x3(x.shape[-1], dtype=self.dtype, winograd=self.winograd)(h)
    return h


class Downsample(nn.Module):
  """x2 downsample: stride-2 conv with (0,1) pad, or avg-pool (reference layers.py:591-608)."""
  with_conv: bool = False
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x):
    B, H, W, C = x.shape
    if self.with_conv:
      x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
      x = nn.Conv(C, (3, 3), strides=(2, 2), padding='VALID',
                  kernel_init=default_init(),
                  bias_init=nn.initializers.zeros, dtype=self.dtype)(x)
    else:
      x = nn.avg_pool(x, (2, 2), strides=(2, 2))
    assert x.shape == (B, H // 2, W // 2, C)
    return x


class ResnetBlockDDPM(nn.Module):
  """DDPM ResNet block (reference layers.py:611-655)."""
  act: Callable
  out_ch: Optional[int] = None
  conv_shortcut: bool = False
  dropout: float = 0.1
  dtype: Dtype = jnp.float32
  winograd: bool = False
  fused_gn: bool = False

  @nn.compact
  def __call__(self, x, temb=None, train=True):
    B, H, W, C = x.shape
    out_ch = self.out_ch if self.out_ch is not None else C
    h = norm_act(x, self.act, min(32, C), self.dtype, self.fused_gn,
                 name='GroupNorm_0')
    h = Conv3x3(out_ch, dtype=self.dtype, winograd=self.winograd)(h)
    if temb is not None:
      h += nn.Dense(out_ch, kernel_init=default_init(),
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype)(self.act(temb))[:, None, None, :]
    h = norm_act(h, self.act, min(32, out_ch), self.dtype, self.fused_gn,
                 name='GroupNorm_1')
    h = nn.Dropout(self.dropout)(h, deterministic=not train)
    h = Conv3x3(out_ch, init_scale=0., dtype=self.dtype,
                winograd=self.winograd)(h)
    if C != out_ch:
      if self.conv_shortcut:
        x = Conv3x3(out_ch, dtype=self.dtype, winograd=self.winograd)(x)
      else:
        x = NIN(out_ch, dtype=self.dtype)(x)
    return x + h
