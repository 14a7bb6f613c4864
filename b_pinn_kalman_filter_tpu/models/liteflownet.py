"""LiteFlowNet in flax, NHWC (reference: models/liteflownet.py, itself
adapted from sniklaus/pytorch-liteflownet).

Faithful to the reference's behavior, including its quirks:

* ``backward_warp`` replicates the reference's empty-slice bug
  (liteflownet.py:26-29: ``tensorFlow[:, 2:1]`` is empty, so the single
  remaining channel broadcasts over both grid coordinates).
* Input mean-shifts are the reference's hardcoded constants
  (liteflownet.py:552-553).
* The API is normalized to the PINN-facing signature
  ``(f1, f2, x, y, t, size=None, train=True) -> flow list`` so
  ``config.model.arch='liteflownet'`` actually composes with PINN (the
  reference's signature mismatch makes that path un-runnable as-is).
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from b_pinn_kalman_filter_tpu.models.flownet import resize_bilinear
from b_pinn_kalman_filter_tpu.ops.correlation_pallas import correlation_auto as correlation
from b_pinn_kalman_filter_tpu.ops.grid_sample import (grid_sample_2d,
                                                      make_normalized_grid)

_lrelu = functools.partial(jax.nn.leaky_relu, negative_slope=0.1)

_KSIZE = [0, 0, 7, 5, 5, 3, 3]
_KPAD = [0, 0, 3, 2, 2, 1, 1]
_DIST_CH = [0, 0, 49, 25, 25, 9, 9]


def backward_warp(tensor_input, flow):
  """Backward warp (reference Backward, liteflownet.py:13-35).

  Reference quirk preserved: the displacement is built from an empty slice
  + channel 0, so ONE scalar field (flow[..., 0] / ((H-1)/2)) displaces
  both x and y grid coordinates.
  """
  B, H, W, C = tensor_input.shape
  grid = make_normalized_grid(B, flow.shape[1], flow.shape[2],
                              dtype=tensor_input.dtype)
  disp = flow[..., 0:1] / ((H - 1.0) / 2.0)
  return grid_sample_2d(tensor_input, grid + disp, padding_mode='zeros',
                        align_corners=True)


def _conv(out_ch, k=3, stride=1):
  if isinstance(k, int):
    k = (k, k)
  pad = [((kk - 1) // 2, (kk - 1) // 2) for kk in k]
  return nn.Conv(out_ch, k, strides=(stride, stride), padding=pad)


class Features(nn.Module):
  """6-level feature pyramid (reference liteflownet.py:46-135)."""

  @nn.compact
  def __call__(self, x):
    one = _lrelu(_conv(32, 7)(x))
    two = _lrelu(_conv(32, 3, 2)(one))
    two = _lrelu(_conv(32)(two))
    two = _lrelu(_conv(32)(two))
    thr = _lrelu(_conv(64, 3, 2)(two))
    thr = _lrelu(_conv(64)(thr))
    fou = _lrelu(_conv(96, 3, 2)(thr))
    fou = _lrelu(_conv(96)(fou))
    fiv = _lrelu(_conv(128, 3, 2)(fou))
    six = _lrelu(_conv(192, 3, 2)(fiv))
    return [one, two, thr, fou, fiv, six]


class GroupedDeconv2x(nn.Module):
  """Grouped k4 s2 p1 transposed conv, bias-free (flow / corr upsampling)."""
  channels: int

  @nn.compact
  def __call__(self, x):
    w = self.param('weight', nn.initializers.lecun_normal(),
                   (4, 4, 1, self.channels))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=self.channels)


class Matching(nn.Module):
  """Cost-volume matching (reference liteflownet.py:141-256)."""
  config: Any
  level: int

  @nn.compact
  def __call__(self, first, second, feat1, feat2, flow):
    level = self.level
    dbl_backward = self.config.data.dt * 0.5 ** level

    if level == 2:
      feat1 = _lrelu(_conv(64, 1)(feat1))
      feat2 = _lrelu(_conv(64, 1)(feat2))

    if flow is not None:
      flow = GroupedDeconv2x(2)(flow)
      feat2 = backward_warp(feat2, flow * dbl_backward)

    if level >= 4:
      corr = jax.nn.leaky_relu(correlation(feat1, feat2, stride=1), 0.1)
    else:
      corr = jax.nn.leaky_relu(correlation(feat1, feat2, stride=2), 0.1)
      corr = GroupedDeconv2x(49)(corr)

    h = _lrelu(_conv(128)(corr))
    h = _lrelu(_conv(64)(h))
    h = _lrelu(_conv(32)(h))
    h = _conv(2, _KSIZE[level])(h)
    return (flow if flow is not None else 0.0) + h


class Subpixel(nn.Module):
  """Subpixel refinement (reference liteflownet.py:262-327)."""
  config: Any
  level: int

  @nn.compact
  def __call__(self, first, second, feat1, feat2, flow):
    level = self.level
    dbl_backward = self.config.data.dt * 0.5 ** level

    if level == 2:
      feat1 = _lrelu(_conv(64, 1)(feat1))
      feat2 = _lrelu(_conv(64, 1)(feat2))

    if flow is not None:
      feat2 = backward_warp(feat2, flow * dbl_backward)

    block = jnp.concatenate([feat1, feat2, flow], axis=-1)
    h = _lrelu(_conv(128)(block))
    h = _lrelu(_conv(64)(h))
    h = _lrelu(_conv(32)(h))
    h = _conv(2, _KSIZE[level])(h)
    return (flow if flow is not None else 0.0) + h


def _unfold(x, k):
  """Extract k x k neighborhoods of a 1-channel NHWC map -> (B, H, W, k*k),
  row-major kernel order (torch F.unfold semantics)."""
  B, H, W, _ = x.shape
  pad = (k - 1) // 2
  xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)])
  patches = []
  for i in range(k):
    for j in range(k):
      patches.append(xp[:, i:i + H, j:j + W, 0])
  return jnp.stack(patches, axis=-1)


class Regularization(nn.Module):
  """Feature-driven local softmax filtering of the flow
  (reference liteflownet.py:333-478)."""
  config: Any
  level: int

  @nn.compact
  def __call__(self, first, second, feat1, feat2, flow):
    level = self.level
    dbl_backward = self.config.data.dt * 0.5 ** level
    k = _KSIZE[level]
    dist_ch = _DIST_CH[level]

    diff = first - backward_warp(second, flow * dbl_backward)
    diff = jnp.sqrt(jnp.sum(diff ** 2, axis=-1, keepdims=True) + 1e-12)
    diff = jax.lax.stop_gradient(diff)

    if level < 5:
      featf = _lrelu(_conv(128, 1)(feat1))
    else:
      featf = feat1

    flow_mean = jnp.mean(flow, axis=(1, 2), keepdims=True)
    block = jnp.concatenate([diff, flow - flow_mean, featf], axis=-1)

    h = _lrelu(_conv(128)(block))
    h = _lrelu(_conv(128)(h))
    h = _lrelu(_conv(64)(h))
    h = _lrelu(_conv(64)(h))
    h = _lrelu(_conv(32)(h))
    h = _lrelu(_conv(32)(h))

    if level >= 5:
      dist = _conv(dist_ch, k)(h)
    else:
      dist = _conv(dist_ch, (k, 1))(h)
      dist = _conv(dist_ch, (1, k))(dist)

    dist = -(dist ** 2)
    dist = jnp.exp(dist - jnp.max(dist, axis=-1, keepdims=True))
    divisor = 1.0 / jnp.sum(dist, axis=-1, keepdims=True)

    ux = _unfold(flow[..., 0:1], k)
    uy = _unfold(flow[..., 1:2], k)
    scale_x = nn.Conv(1, (1, 1))(dist * ux) * divisor
    scale_y = nn.Conv(1, (1, 1))(dist * uy) * divisor
    return jnp.concatenate([scale_x, scale_y], axis=-1)


class LiteFlowNet(nn.Module):
  """LiteFlowNet cascade (reference liteflownet.py:38-562)."""
  config: Any

  @nn.compact
  def __call__(self, f1, f2, x=None, y=None, t=None, size=None, train=True):
    # Hardcoded input mean shifts (reference liteflownet.py:552-553).
    f1 = f1 - 0.411618
    f2 = f2 - 0.410782

    feats1 = Features()(f1)
    feats2 = Features()(f2)

    firsts = [f1]
    seconds = [f2]
    for lvl in range(1, 6):
      firsts.append(resize_bilinear(
          firsts[-1], feats1[lvl].shape[1:3]))
      seconds.append(resize_bilinear(
          seconds[-1], feats2[lvl].shape[1:3]))

    flow = None
    collection = []
    for idx in [-1, -2, -3, -4, -5]:
      level = [2, 3, 4, 5, 6][idx]
      flow = Matching(self.config, level)(
          firsts[idx], seconds[idx], feats1[idx], feats2[idx], flow)
      flow = Subpixel(self.config, level)(
          firsts[idx], seconds[idx], feats1[idx], feats2[idx], flow)
      flow = Regularization(self.config, level)(
          firsts[idx], seconds[idx], feats1[idx], feats2[idx], flow)
      collection.append(flow)

    # Full-resolution flow x2 (reference forward, liteflownet.py:550-562).
    full = (f1.shape[1], f1.shape[2]) if size is None else size
    flow_full = resize_bilinear(collection[-1], full) * 2
    collection.append(flow_full)
    return collection


def postprocess_flow(flow_collection, raw_shape, processed_shape):
  """Rescale flow to raw resolution (reference liteflownet.py:538-548)."""
  h, w = raw_shape
  p_h, p_w = processed_shape
  flow = resize_bilinear(flow_collection[-1], (h, w))
  return flow * jnp.asarray([w / p_w, h / p_h], flow.dtype)
