"""Pyramidal optical-flow network + pressure U-Net for PINN flow inference
(reference: models/flownet.py), flax / NHWC.

The semi-Lagrangian warp ``project`` and the correlation cost volume are the
two custom-CUDA ops of the reference (op/grid_sample, op/correlation); here
they are ``ops.grid_sample`` / ``ops.correlation`` with autodiff to any
order (PINN residuals differentiate through them).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from b_pinn_kalman_filter_tpu.models import layers
from b_pinn_kalman_filter_tpu.models.layers_ncsn import ResidualBlock
from b_pinn_kalman_filter_tpu.models.normalization import InstanceNorm2d
from b_pinn_kalman_filter_tpu.ops.correlation_pallas import correlation_auto as correlation
from b_pinn_kalman_filter_tpu.ops.grid_sample import (grid_sample_2d,
                                                      make_normalized_grid)

Array = jax.Array

_lrelu = functools.partial(jax.nn.leaky_relu, negative_slope=0.1)


def project(f: Array, u: Array, dt: float) -> Array:
  """Semi-Lagrangian backward warp (reference models/flownet.py:8-25).

  f: (B, H, W, C); u: (B, H, W, 2) with u[..., 0] displacing y and
  u[..., 1] displacing x (faithful to the reference's channel swap,
  flownet.py:17-20).
  """
  B, H, W, C = f.shape
  grid = make_normalized_grid(B, H, W, dtype=f.dtype)
  disp = jnp.concatenate([
      u[..., 1:2] / ((H - 1.0) / 2.0),   # x-coordinate displacement
      u[..., 0:1] / ((W - 1.0) / 2.0),   # y-coordinate displacement
  ], axis=-1)
  return grid_sample_2d(f, grid - disp * dt, padding_mode='border',
                        align_corners=True)


def resize_bilinear(x: Array, size) -> Array:
  """Bilinear resize, align_corners=False (torch F.interpolate default)."""
  B, H, W, C = x.shape
  return jax.image.resize(x, (B, size[0], size[1], C), method='linear',
                          antialias=False)


class ConvFeature(nn.Module):
  """Stride-2 feature layer (reference get_conv_feature_layer, flownet.py:27-33).

  The strided conv needs EXPLICIT symmetric (1,1) padding: torch
  Conv2d(k=3, s=2, p=1) taps rows {2i-1, 2i, 2i+1}, while XLA 'SAME' at
  stride 2 pads (0, 1) on even sizes and taps {2i, 2i+1, 2i+2} — same
  output shape, one-pixel receptive-field shift (caught by the
  torch-oracle PINN parity test; feature maps diverged ~0.5)."""
  out_ch: int

  @nn.compact
  def __call__(self, x):
    x = _lrelu(nn.Conv(self.out_ch, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))(x))
    x = _lrelu(nn.Conv(self.out_ch, (3, 3), padding='SAME')(x))
    return x


class ConvField(nn.Module):
  """Field head: C->128->64->32->out (reference get_conv_field_layer)."""
  out_ch: int

  @nn.compact
  def __call__(self, x):
    x = _lrelu(nn.Conv(128, (3, 3), padding='SAME')(x))
    x = _lrelu(nn.Conv(64, (3, 3), padding='SAME')(x))
    x = _lrelu(nn.Conv(32, (3, 3), padding='SAME')(x))
    return nn.Conv(self.out_ch, (3, 3), padding='SAME')(x)


class ConvUp(nn.Module):
  """Final upsample refiner (reference get_conv_up_layer)."""
  out_ch: int

  @nn.compact
  def __call__(self, x):
    x = _lrelu(nn.Conv(64, (3, 3), padding='SAME')(x))
    x = _lrelu(nn.Conv(32, (3, 3), padding='SAME')(x))
    return nn.Conv(self.out_ch, (3, 3), padding='SAME')(x)


class FeatureExtractor(nn.Module):
  """Pyramid feature extractor with spatial + timestep embeddings per level
  (reference flownet.py:60-90)."""
  config: Any

  @nn.compact
  def __call__(self, f, x, y, t):
    config = self.config
    semb = layers.get_spatial_embedding(
        x, y, omega=config.model.spatial_embed_omega,
        s=config.model.spatial_embed_s_flow)
    result = []
    for i, ch_o in enumerate(config.model.feature_nums):
      channel = f.shape[-1]
      temb = layers.get_timestep_embedding(t, channel)[:, None, None, :]
      f = ConvFeature(ch_o)(f + semb + temb)
      result.append(f)
      semb = nn.avg_pool(semb, (2, 2), strides=(2, 2))
    return result


class FlowUpsample(nn.Module):
  """Grouped 2x transposed conv for flow fields (reference
  flownet.py:98-105: ConvTranspose2d(2,2,k4,s2,p1,groups=2,bias=False))."""

  @nn.compact
  def __call__(self, flow):
    w = self.param('weight', nn.initializers.lecun_normal(), (4, 4, 1, 2))
    return jax.lax.conv_general_dilated(
        flow, w, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=2)


class Matching(nn.Module):
  """Cost-volume matching unit (reference flownet.py:93-121)."""
  config: Any
  level: int

  @nn.compact
  def __call__(self, feature1, feature2, flow=None):
    dt = self.config.data.dt * 0.5 ** self.level
    if flow is not None:
      flow = FlowUpsample()(flow)
      feature2 = project(feature2, flow, -dt)
    else:
      flow = 0.0
    corr = correlation(feature1, feature2, stride=1)
    corr = jax.nn.leaky_relu(corr, 0.01)
    return flow + ConvField(2)(corr)


class SubpixelRefinement(nn.Module):
  """Subpixel refinement unit (reference flownet.py:123-138)."""
  config: Any
  level: int

  @nn.compact
  def __call__(self, feature1, feature2, flow):
    dt = self.config.data.dt * 0.5 ** (self.level + 1)
    feature2 = project(feature2, flow, -dt)
    block = jnp.concatenate([feature1, feature2, flow], axis=-1)
    return flow + ConvField(2)(block)


class InferenceUnit(nn.Module):
  """Matching + refinement (reference flownet.py:140-150)."""
  config: Any
  level: int

  @nn.compact
  def __call__(self, feature1, feature2, flow=None):
    flow_m = Matching(self.config, self.level)(feature1, feature2, flow)
    return SubpixelRefinement(self.config, self.level)(feature1, feature2, flow_m)


class FinalUpsample(nn.Module):
  """Upsample to full resolution + refine (reference flownet.py:153-163)."""

  @nn.compact
  def __call__(self, f1, f2, x, size):
    x = resize_bilinear(x, size)
    block = jnp.concatenate([f1, f2, x], axis=-1)
    return x + ConvUp(2)(block)


class FlowNet(nn.Module):
  """Coarse-to-fine optical flow cascade (reference flownet.py:166-216)."""
  config: Any

  @nn.compact
  def __call__(self, f1, f2, x, y, t, size=None, train=True):
    config = self.config
    n_levels = len(config.model.feature_nums)
    if (f1.shape[1] % (2 ** n_levels) != 0
        or f1.shape[2] % (2 ** n_levels) != 0):
      # Each pyramid level halves the resolution and the coarse-to-fine
      # cascade doubles flow fields back up; a non-divisible input size
      # desynchronizes feature and flow grids mid-cascade (the reference
      # has the same constraint implicitly — its default is 64 with 5
      # levels).  Fail clearly instead of with a shape error 4 levels deep.
      raise ValueError(
          f'image size {f1.shape[1]}x{f1.shape[2]} must be divisible by '
          f'2^{n_levels} (= {2 ** n_levels}) for {n_levels} pyramid levels; '
          f"shrink config.model.feature_nums (CLI: --config.model."
          f"feature_nums='(8,16,32)') or pad the input")
    extractor = FeatureExtractor(config)
    f1_features = extractor(f1, x, y, t)
    f2_features = extractor(f2, x, y, t)

    levels = list(range(len(config.model.feature_nums)))[::-1]
    cascaded_flow = []
    flow = None
    for level in levels:
      flow = InferenceUnit(config, level)(
          f1_features[level], f2_features[level], flow)
      cascaded_flow.append(flow)

    full = (config.data.image_size, config.data.image_size) if size is None else size
    flow = FinalUpsample()(f1, f2, flow, full)
    cascaded_flow.append(flow)
    return cascaded_flow


def multiscale_data_mse(veloc_pred: List[Array], target: Array,
                        error_fn: Optional[Callable] = None) -> Array:
  """Multi-scale flow loss (reference flownet.py:195-216).
  ``target`` is (B, H, W, >=2) with flow in the first two channels."""
  if error_fn is None:
    error_fn = lambda a, b: jnp.mean((a - b) ** 2)
  h, w = veloc_pred[-1].shape[1], veloc_pred[-1].shape[2]
  weights = [12.7, 5.5, 4.35, 3.9, 3.4, 1.1][:len(veloc_pred)]
  v_loss = 0.0
  for i, weight in enumerate(weights):
    scale_factor = 1.0 / (2 ** i)
    flow = veloc_pred[-1 - i]
    v_loss += weight * error_fn(flow * scale_factor,
                                target[..., :2] * scale_factor)
    h, w = h // 2, w // 2
    target = resize_bilinear(target, (h, w))
  return v_loss


# ---------------------------------------------------------------------------
# PressureNet (reference flownet.py:219-321)
# ---------------------------------------------------------------------------

def _inorm_factory():
  return InstanceNorm2d


class DoubleRes(nn.Module):
  """Two chained NCSN residual blocks (reference get_double_res,
  flownet.py:219-224; InstanceNorm + ELU defaults)."""
  out_ch: int

  @nn.compact
  def __call__(self, x):
    in_ch = x.shape[-1]
    x = ResidualBlock(in_ch * 2, _inorm_factory())(x)
    return ResidualBlock(self.out_ch, _inorm_factory())(x)


class PressureNet(nn.Module):
  """U-Net over flow-norm features -> pressure field
  (reference flownet.py:237-321)."""
  config: Any

  @nn.compact
  def __call__(self, cascaded_flow, x, y, t, train=True):
    config = self.config
    channels = list(config.model.feature_nums)
    flow_feature_nums = 32

    # One shared flow-feature module across all pyramid levels, matching the
    # reference's single self.flow_feature = get_double_res(3, 32)
    # (reference models/flownet.py:243,296,308).
    flow_feature_mod = DoubleRes(flow_feature_nums)

    def norm_feature(flow):
      flow = jax.lax.stop_gradient(flow)   # reference .detach().clone()
      flow_norm = -jnp.sum(flow ** 2, axis=-1, keepdims=True)
      block = jnp.concatenate([flow, flow_norm], axis=-1)
      return flow_feature_mod(block)

    semb = layers.get_spatial_embedding(
        x, y, omega=config.model.spatial_embed_omega,
        s=config.model.spatial_embed_s_pres)
    semb_list = [semb]
    for _ in range(len(channels) - 2):
      semb = nn.avg_pool(semb, (2, 2), strides=(2, 2))
      semb_list.append(semb)

    temb = layers.get_timestep_embedding(t, flow_feature_nums)[:, None, None, :]

    h = norm_feature(cascaded_flow[-1]) + temb + semb_list[0]
    h = DoubleRes(channels[0])(h)
    features = [h]
    for ch_o in channels[1:]:
      h = nn.max_pool(h, (2, 2), strides=(2, 2))
      h = DoubleRes(ch_o)(h)
      features.append(h)
    features.pop(-1)

    for idx in range(len(features)):
      feature = features[-1 - idx]
      flow_feature = (norm_feature(cascaded_flow[idx + 2]) + temb
                      + semb_list[-1 - idx])
      ch_o = channels[-2 - idx]
      h = nn.ConvTranspose(ch_o, (2, 2), strides=(2, 2))(h)
      block = jnp.concatenate([feature, h, flow_feature], axis=-1)
      h = DoubleRes(ch_o)(block)

    # end head (reference flownet.py:269-274)
    h = DoubleRes(channels[0] // 2)(h)
    h = nn.Conv(channels[0] // 2, (1, 1))(h)
    h = DoubleRes(1)(h)
    return nn.Conv(1, (1, 1))(h)


def pressure_data_mse(pressure: Array, target: Array,
                      error_fn: Optional[Callable] = None) -> Array:
  """Pressure loss (reference flownet.py:320-321): target channel 2."""
  if error_fn is None:
    error_fn = lambda a, b: jnp.mean((a - b) ** 2)
  return error_fn(pressure, target[..., 2:3])
