"""NCSNv1/v2 RefineNet score models (reference: models/ncsnv2.py)."""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from b_pinn_kalman_filter_tpu.models import layers, layers_ncsn, normalization, registry
from b_pinn_kalman_filter_tpu.models.layers_ncsn import (
    ConditionalResidualBlock, CondRefineBlock, NCSNConv, RefineBlock,
    ResidualBlock)


def _channels(config):
  # Reference ncsnv2 uses config.data.channels; our config schema calls it
  # num_channels — accept both.
  return getattr(config.data, 'channels', None) or config.data.num_channels


def get_network(config):
  """Pick the NCSNv2 variant by image size (reference ncsnv2.py:31-40)."""
  if config.data.image_size < 96:
    return functools.partial(NCSNv2, config=config)
  elif 96 <= config.data.image_size <= 128:
    return functools.partial(NCSNv2_128, config=config)
  elif 128 < config.data.image_size <= 256:
    return functools.partial(NCSNv2_256, config=config)
  raise NotImplementedError(
      f'No network suitable for {config.data.image_size}px implemented yet.')


def _res_pair(norm, act, out_ch, resample=None, dilation=1, adjust_padding=False):
  """Two-block stage: (resampling block, plain block)."""
  return [ResidualBlock(out_ch, norm, resample=resample, act=act,
                        adjust_padding=adjust_padding, dilation=dilation),
          ResidualBlock(out_ch, norm, resample=None, act=act,
                        dilation=dilation)]


@registry.register_model(name='ncsnv2_64')
class NCSNv2(nn.Module):
  """NCSNv2 for <96px images (reference ncsnv2.py:43-132)."""
  config: Any

  @nn.compact
  def __call__(self, x, y, train=True):
    config = self.config
    act = layers.get_act(config)
    norm = normalization.get_normalization(config)
    nf = config.model.nf

    h = x if config.data.centered else 2 * x - 1.
    output = NCSNConv(nf)(h)

    def stage(h, out_ch, resample=None, dilation=1, adjust_padding=False):
      for blk in _res_pair(norm, act, out_ch, resample, dilation, adjust_padding):
        h = blk(h)
      return h

    layer1 = stage(output, nf)
    layer2 = stage(layer1, 2 * nf, resample='down')
    layer3 = stage(layer2, 2 * nf, resample='down', dilation=2)
    adjust = config.data.image_size == 28
    layer4 = stage(layer3, 2 * nf, resample='down', dilation=4,
                   adjust_padding=adjust)

    ref1 = RefineBlock(2 * nf, 1, act, start=True)([layer4], layer4.shape[1:3])
    ref2 = RefineBlock(2 * nf, 2, act)([layer3, ref1], layer3.shape[1:3])
    ref3 = RefineBlock(nf, 2, act)([layer2, ref2], layer2.shape[1:3])
    output = RefineBlock(nf, 2, act, end=True)([layer1, ref3], layer1.shape[1:3])

    output = norm()(output)
    output = act(output)
    output = NCSNConv(_channels(config))(output)

    sigmas = jnp.asarray(registry.get_sigmas(config), jnp.float32)
    used_sigmas = sigmas[y.astype(jnp.int32)]
    return output / used_sigmas[:, None, None, None]


@registry.register_model(name='ncsn')
class NCSN(nn.Module):
  """Original class-conditional NCSN (reference ncsnv2.py:135-218)."""
  config: Any

  @nn.compact
  def __call__(self, x, y, train=True):
    config = self.config
    act = layers.get_act(config)
    norm = normalization.get_normalization(config, conditional=True)
    nf = config.model.nf
    y = y.astype(jnp.int32)

    h = x if config.data.centered else 2 * x - 1.
    output = NCSNConv(nf)(h)

    def stage(h, out_ch, resample=None, dilation=1, adjust_padding=False):
      h = ConditionalResidualBlock(out_ch, norm, resample=resample, act=act,
                                   adjust_padding=adjust_padding,
                                   dilation=dilation)(h, y)
      h = ConditionalResidualBlock(out_ch, norm, resample=None, act=act,
                                   dilation=dilation)(h, y)
      return h

    layer1 = stage(output, nf)
    layer2 = stage(layer1, 2 * nf, resample='down')
    layer3 = stage(layer2, 2 * nf, resample='down', dilation=2)
    adjust = config.data.image_size == 28
    layer4 = stage(layer3, 2 * nf, resample='down', dilation=4,
                   adjust_padding=adjust)

    ref1 = CondRefineBlock(2 * nf, 1, norm, act, start=True)(
        [layer4], y, layer4.shape[1:3])
    ref2 = CondRefineBlock(2 * nf, 2, norm, act)(
        [layer3, ref1], y, layer3.shape[1:3])
    ref3 = CondRefineBlock(nf, 2, norm, act)(
        [layer2, ref2], y, layer2.shape[1:3])
    output = CondRefineBlock(nf, 2, norm, act, end=True)(
        [layer1, ref3], y, layer1.shape[1:3])

    output = norm()(output, y)
    output = act(output)
    return NCSNConv(_channels(config))(output)


@registry.register_model(name='ncsnv2_128')
class NCSNv2_128(nn.Module):
  """NCSNv2 for 128px images (reference ncsnv2.py:221-312)."""
  config: Any

  @nn.compact
  def __call__(self, x, y, train=True):
    config = self.config
    act = layers.get_act(config)
    norm = normalization.get_normalization(config)
    nf = config.model.nf

    h = x if config.data.centered else 2 * x - 1.
    output = NCSNConv(nf)(h)

    def stage(h, out_ch, resample=None, dilation=1):
      for blk in _res_pair(norm, act, out_ch, resample, dilation):
        h = blk(h)
      return h

    layer1 = stage(output, nf)
    layer2 = stage(layer1, 2 * nf, resample='down')
    layer3 = stage(layer2, 2 * nf, resample='down')
    layer4 = stage(layer3, 4 * nf, resample='down', dilation=2)
    layer5 = stage(layer4, 4 * nf, resample='down', dilation=4)

    ref1 = RefineBlock(4 * nf, 1, act, start=True)([layer5], layer5.shape[1:3])
    ref2 = RefineBlock(2 * nf, 2, act)([layer4, ref1], layer4.shape[1:3])
    ref3 = RefineBlock(2 * nf, 2, act)([layer3, ref2], layer3.shape[1:3])
    ref4 = RefineBlock(nf, 2, act)([layer2, ref3], layer2.shape[1:3])
    output = RefineBlock(nf, 2, act, end=True)([layer1, ref4], layer1.shape[1:3])

    output = norm()(output)
    output = act(output)
    output = NCSNConv(_channels(config))(output)

    sigmas = jnp.asarray(registry.get_sigmas(config), jnp.float32)
    used_sigmas = sigmas[y.astype(jnp.int32)]
    return output / used_sigmas[:, None, None, None]


@registry.register_model(name='ncsnv2_256')
class NCSNv2_256(nn.Module):
  """NCSNv2 for 256px images (reference ncsnv2.py:315-416)."""
  config: Any

  @nn.compact
  def __call__(self, x, y, train=True):
    config = self.config
    act = layers.get_act(config)
    norm = normalization.get_normalization(config)
    nf = config.model.nf

    h = x if config.data.centered else 2 * x - 1.
    output = NCSNConv(nf)(h)

    def stage(h, out_ch, resample=None, dilation=1):
      for blk in _res_pair(norm, act, out_ch, resample, dilation):
        h = blk(h)
      return h

    layer1 = stage(output, nf)
    layer2 = stage(layer1, 2 * nf, resample='down')
    layer3 = stage(layer2, 2 * nf, resample='down')
    layer31 = stage(layer3, 2 * nf, resample='down')
    layer4 = stage(layer31, 4 * nf, resample='down', dilation=2)
    layer5 = stage(layer4, 4 * nf, resample='down', dilation=4)

    ref1 = RefineBlock(4 * nf, 1, act, start=True)([layer5], layer5.shape[1:3])
    ref2 = RefineBlock(2 * nf, 2, act)([layer4, ref1], layer4.shape[1:3])
    ref31 = RefineBlock(2 * nf, 2, act)([layer31, ref2], layer31.shape[1:3])
    ref3 = RefineBlock(2 * nf, 2, act)([layer3, ref31], layer3.shape[1:3])
    ref4 = RefineBlock(nf, 2, act)([layer2, ref3], layer2.shape[1:3])
    output = RefineBlock(nf, 2, act, end=True)([layer1, ref4], layer1.shape[1:3])

    output = norm()(output)
    output = act(output)
    output = NCSNConv(_channels(config))(output)

    sigmas = jnp.asarray(registry.get_sigmas(config), jnp.float32)
    used_sigmas = sigmas[y.astype(jnp.int32)]
    return output / used_sigmas[:, None, None, None]
