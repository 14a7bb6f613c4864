"""Normalization layers in flax, NHWC (reference: models/normalization.py).

All spatial reductions are over axes (1, 2) (H, W) — the reference's NCHW
(2, 3).  torch ``var`` defaults to the unbiased estimator; replicated here.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


def get_normalization(config, conditional: bool = False):
  """Normalization factory from config (reference normalization.py:22-40)."""
  norm = config.model.normalization
  if conditional:
    if norm == 'InstanceNorm++':
      return functools.partial(ConditionalInstanceNorm2dPlus,
                               num_classes=config.model.num_classes)
    raise NotImplementedError(f'{norm} not implemented yet.')
  if norm == 'InstanceNorm':
    return InstanceNorm2d
  elif norm == 'InstanceNorm++':
    return InstanceNorm2dPlus
  elif norm == 'VarianceNorm':
    return VarianceNorm2d
  elif norm == 'GroupNorm':
    return lambda: nn.GroupNorm(num_groups=32, epsilon=1e-6)
  else:
    raise ValueError('Unknown normalization: %s' % norm)


def _unbiased_var(x, axis, keepdims=False):
  return jnp.var(x, axis=axis, keepdims=keepdims, ddof=1)


class InstanceNorm2d(nn.Module):
  """Per-channel instance norm without affine (torch InstanceNorm2d)."""
  epsilon: float = 1e-5

  @nn.compact
  def __call__(self, x):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)   # biased, as torch IN
    return (x - mean) / jnp.sqrt(var + self.epsilon)


class VarianceNorm2d(nn.Module):
  """Variance-only norm (reference normalization.py:110-123)."""
  bias: bool = False

  @nn.compact
  def __call__(self, x):
    C = x.shape[-1]
    alpha = self.param('alpha',
                       lambda k, s: 1 + 0.02 * jax.random.normal(k, s), (C,))
    vars_ = _unbiased_var(x, axis=(1, 2), keepdims=True)
    h = x / jnp.sqrt(vars_ + 1e-5)
    return alpha * h


class NoneNorm2d(nn.Module):

  @nn.compact
  def __call__(self, x):
    return x


class InstanceNorm2dPlus(nn.Module):
  """InstanceNorm++ (reference normalization.py:157-183): instance norm with
  a cross-channel re-injection of the normalized per-channel means to avoid
  the IN color-shift artifact."""
  bias: bool = True

  @nn.compact
  def __call__(self, x):
    C = x.shape[-1]
    init = lambda k, s: 1 + 0.02 * jax.random.normal(k, s)
    alpha = self.param('alpha', init, (C,))
    gamma = self.param('gamma', init, (C,))
    means = jnp.mean(x, axis=(1, 2))                   # (B, C)
    m = jnp.mean(means, axis=-1, keepdims=True)
    v = _unbiased_var(means, axis=-1, keepdims=True)
    means = (means - m) / jnp.sqrt(v + 1e-5)
    h = InstanceNorm2d()(x)
    h = h + means[:, None, None, :] * alpha
    if self.bias:
      beta = self.param('beta', nn.initializers.zeros, (C,))
      return gamma * h + beta
    return gamma * h


class ConditionalBatchNorm2d(nn.Module):
  """Class-conditional batch norm (reference normalization.py:43-65).
  Uses batch statistics (the reference's train-mode behavior)."""
  num_classes: int
  bias: bool = True

  @nn.compact
  def __call__(self, x, y):
    C = x.shape[-1]
    mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
    out = (x - mean) / jnp.sqrt(var + 1e-5)
    if self.bias:
      embed = nn.Embed(self.num_classes, C * 2,
                       embedding_init=lambda k, s, d=None: jnp.concatenate(
                           [jax.random.uniform(k, (s[0], C)),
                            jnp.zeros((s[0], C))], axis=-1))
      gamma, beta = jnp.split(embed(y), 2, axis=-1)
      return gamma[:, None, None, :] * out + beta[:, None, None, :]
    embed = nn.Embed(self.num_classes, C,
                     embedding_init=lambda k, s, d=None:
                     jax.random.uniform(k, s))
    return embed(y)[:, None, None, :] * out


class ConditionalInstanceNorm2d(nn.Module):
  """Class-conditional instance norm (reference normalization.py:68-90)."""
  num_classes: int
  bias: bool = True

  @nn.compact
  def __call__(self, x, y):
    C = x.shape[-1]
    h = InstanceNorm2d()(x)
    if self.bias:
      embed = nn.Embed(self.num_classes, C * 2,
                       embedding_init=lambda k, s, d=None: jnp.concatenate(
                           [jax.random.uniform(k, (s[0], C)),
                            jnp.zeros((s[0], C))], axis=-1))
      gamma, beta = jnp.split(embed(y), 2, axis=-1)
      return gamma[:, None, None, :] * h + beta[:, None, None, :]
    embed = nn.Embed(self.num_classes, C,
                     embedding_init=lambda k, s, d=None:
                     jax.random.uniform(k, s))
    return embed(y)[:, None, None, :] * h


class ConditionalVarianceNorm2d(nn.Module):
  """Class-conditional variance norm (reference normalization.py:93-107)."""
  num_classes: int
  bias: bool = False

  @nn.compact
  def __call__(self, x, y):
    C = x.shape[-1]
    embed = nn.Embed(self.num_classes, C,
                     embedding_init=lambda k, s, d=None:
                     1 + 0.02 * jax.random.normal(k, s))
    vars_ = _unbiased_var(x, axis=(1, 2), keepdims=True)
    h = x / jnp.sqrt(vars_ + 1e-5)
    return embed(y)[:, None, None, :] * h


class ConditionalNoneNorm2d(nn.Module):
  """Affine-only conditional 'norm' (reference normalization.py:126-146)."""
  num_classes: int
  bias: bool = True

  @nn.compact
  def __call__(self, x, y):
    C = x.shape[-1]
    if self.bias:
      embed = nn.Embed(self.num_classes, C * 2,
                       embedding_init=lambda k, s, d=None: jnp.concatenate(
                           [jax.random.uniform(k, (s[0], C)),
                            jnp.zeros((s[0], C))], axis=-1))
      gamma, beta = jnp.split(embed(y), 2, axis=-1)
      return gamma[:, None, None, :] * x + beta[:, None, None, :]
    embed = nn.Embed(self.num_classes, C,
                     embedding_init=lambda k, s, d=None:
                     jax.random.uniform(k, s))
    return embed(y)[:, None, None, :] * x


class ConditionalInstanceNorm2dPlus(nn.Module):
  """Class-conditional InstanceNorm++ (reference normalization.py:186-215)."""
  num_classes: int
  bias: bool = True

  @nn.compact
  def __call__(self, x, y):
    C = x.shape[-1]
    if self.bias:
      embed = nn.Embed(self.num_classes, C * 3,
                       embedding_init=lambda k, s, d=None:
                       jnp.concatenate([
                           1 + 0.02 * jax.random.normal(k, (s[0], 2 * C)),
                           jnp.zeros((s[0], C))], axis=-1))
    else:
      embed = nn.Embed(self.num_classes, C * 2,
                       embedding_init=lambda k, s, d=None:
                       1 + 0.02 * jax.random.normal(k, s))

    means = jnp.mean(x, axis=(1, 2))
    m = jnp.mean(means, axis=-1, keepdims=True)
    v = _unbiased_var(means, axis=-1, keepdims=True)
    means = (means - m) / jnp.sqrt(v + 1e-5)
    h = InstanceNorm2d()(x)

    emb = embed(y)
    if self.bias:
      gamma, alpha, beta = jnp.split(emb, 3, axis=-1)
      h = h + means[:, None, None, :] * alpha[:, None, None, :]
      return gamma[:, None, None, :] * h + beta[:, None, None, :]
    gamma, alpha = jnp.split(emb, 2, axis=-1)
    h = h + means[:, None, None, :] * alpha[:, None, None, :]
    return gamma[:, None, None, :] * h
