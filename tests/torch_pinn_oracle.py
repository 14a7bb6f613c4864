"""Independent torch PINN (FlowNet + PressureNet) oracle for the
dual-optimizer checkpoint-converter parity tests.

Plain NCHW torch modules with the REFERENCE's state-dict key layout
(reference models/flownet.py — Sequential indices from the
get_conv_feature/field/up_layer builders :27-58, the attribute names
feature_extractor/inference_units/upsample :166-176 and
flow_feature/first/down/up/up_conv/end :237-274; reference pinn_kalman/
pinn.py:34-65 composes them as ``flownet`` / ``pressurenet``), so
`torch_port.pinn_params_from_torch_state_dict` is validated against a
genuinely separate implementation (the tests/torch_ddpm_oracle.py pattern).

Compute parity notes:
* correlation mirrors the reference CUDA kernel semantics documented in
  ops/correlation.py (49 shifts, zero pad, channel mean);
* project uses F.grid_sample border/align_corners=True with the
  reference's deliberate flow-channel swap (reference flownet.py:17-20);
* the double-res blocks use InstanceNorm2d(affine=False) — no parameters,
  exactly like reference get_double_res defaults.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t, dim, max_positions=10000):
  half = dim // 2
  emb = math.log(max_positions) / (half - 1 if half > 1 else 1)
  emb = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
  emb = t.float()[:, None] * emb[None, :]
  emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=1)
  if dim % 2 == 1:
    emb = F.pad(emb, (0, 1))
  return emb


def spatial_embedding(x, y, omega, s=1.0):
  eps = 1e-12  # matches our flax guard; irrelevant off the exact origin
  e1 = torch.sin(omega * torch.sqrt(x ** 2 + y ** 2 + eps))
  e2 = torch.sin(omega * torch.sqrt((x.max() - x) ** 2
                                    + (y.max() - y) ** 2 + eps))
  return (e1 + e2) / s


def project(f, u, dt):
  B, C, H, W = u.shape
  gh = torch.linspace(-1.0, 1.0, f.shape[3]).view(1, 1, 1, -1).expand(
      B, 1, f.shape[2], -1)
  gv = torch.linspace(-1.0, 1.0, f.shape[2]).view(1, 1, -1, 1).expand(
      B, 1, -1, f.shape[3])
  grid = torch.cat([gh, gv], 1)
  u = torch.cat([u[:, 1:2] / ((f.shape[2] - 1.0) / 2.0),
                 u[:, 0:1] / ((f.shape[3] - 1.0) / 2.0)], 1)
  return F.grid_sample(f, (grid - u * dt).permute(0, 2, 3, 1),
                       mode='bilinear', padding_mode='border',
                       align_corners=True)


def correlation(f1, f2, stride=1):
  """49-shift local correlation, zero-padded, channel-mean (see
  ops/correlation.py docstring for the reference CUDA semantics)."""
  assert stride == 1
  B, C, H, W = f1.shape
  f2p = F.pad(f2, (3, 3, 3, 3))
  outs = []
  for dy in range(-3, 4):
    for dx in range(-3, 4):
      shifted = f2p[:, :, 3 + dy:3 + dy + H, 3 + dx:3 + dx + W]
      outs.append((f1 * shifted).mean(dim=1))
  return torch.stack(outs, dim=1)


def conv_feature_layer(cin, cout):
  return nn.Sequential(
      nn.Conv2d(cin, cout, 3, stride=2, padding=1), nn.LeakyReLU(0.1),
      nn.Conv2d(cout, cout, 3, padding=1), nn.LeakyReLU(0.1))


def conv_field_layer(cin, cout):
  return nn.Sequential(
      nn.Conv2d(cin, 128, 3, padding=1), nn.LeakyReLU(0.1),
      nn.Conv2d(128, 64, 3, padding=1), nn.LeakyReLU(0.1),
      nn.Conv2d(64, 32, 3, padding=1), nn.LeakyReLU(0.1),
      nn.Conv2d(32, cout, 3, padding=1))


def conv_up_layer(cout):
  return nn.Sequential(
      nn.Conv2d(2 + cout, 64, 3, padding=1), nn.LeakyReLU(0.1),
      nn.Conv2d(64, 32, 3, padding=1), nn.LeakyReLU(0.1),
      nn.Conv2d(32, cout, 3, padding=1))


class FeatureExtractor(nn.Module):

  def __init__(self, config):
    super().__init__()
    self.omega = config.model.spatial_embed_omega
    self.s = config.model.spatial_embed_s_flow
    mods, ch_i = [], config.data.num_channels
    for ch_o in config.model.feature_nums:
      mods.append(conv_feature_layer(ch_i, ch_o))
      ch_i = ch_o
    self.feature_extractors = nn.ModuleList(mods)

  def forward(self, f, x, y, t):
    result = []
    semb = spatial_embedding(x, y, self.omega, self.s)
    for layer in self.feature_extractors:
      temb = timestep_embedding(t, f.shape[1])[:, :, None, None]
      f = layer(f + semb + temb)
      result.append(f)
      semb = F.avg_pool2d(semb, 2, 2)
    return result


class Matching(nn.Module):

  def __init__(self, config, level):
    super().__init__()
    self.dt = config.data.dt * 0.5 ** level
    # Created unconditionally like the reference (flownet.py:98-105) even
    # though the coarsest unit never uses it.
    self.flow_upsample = nn.ConvTranspose2d(2, 2, 4, stride=2, padding=1,
                                            groups=2, bias=False)
    self.corr_conv = conv_field_layer(49, 2)

  def forward(self, feature1, feature2, flow=None):
    if flow is not None:
      flow = self.flow_upsample(flow)
      feature2 = project(feature2, flow, -self.dt)
    else:
      flow = 0.0
    corr = F.leaky_relu(correlation(feature1, feature2))
    return flow + self.corr_conv(corr)


class SubpixelRefinement(nn.Module):

  def __init__(self, config, level):
    super().__init__()
    self.dt = config.data.dt * 0.5 ** (level + 1)
    self.flow_conv = conv_field_layer(
        config.model.feature_nums[level] * 2 + 2, 2)

  def forward(self, feature1, feature2, flow):
    feature2 = project(feature2, flow, -self.dt)
    return flow + self.flow_conv(torch.cat([feature1, feature2, flow], 1))


class InferenceUnit(nn.Module):

  def __init__(self, config, level):
    super().__init__()
    self.level = level
    self.match = Matching(config, level)
    self.refinement = SubpixelRefinement(config, level)

  def forward(self, feature1, feature2, flow=None):
    return self.refinement(feature1, feature2,
                           self.match(feature1, feature2, flow))


class Upsample(nn.Module):

  def __init__(self):
    super().__init__()
    self.up = conv_up_layer(2)

  def forward(self, f1, f2, x, size):
    x = F.interpolate(x, size=size, mode='bilinear', align_corners=False)
    return x + self.up(torch.cat([f1, f2, x], 1))


class TorchFlowNet(nn.Module):

  def __init__(self, config):
    super().__init__()
    self.size = (config.data.image_size, config.data.image_size)
    self.feature_extractor = FeatureExtractor(config)
    levels = list(range(len(config.model.feature_nums)))[::-1]
    self.inference_units = nn.ModuleList(
        [InferenceUnit(config, level) for level in levels])
    self.upsample = Upsample()

  def forward(self, f1, f2, x, y, t, size=None):
    f1_features = self.feature_extractor(f1, x, y, t)
    f2_features = self.feature_extractor(f2, x, y, t)
    cascaded, flow = [], None
    for unit in self.inference_units:
      flow = unit(f1_features[unit.level], f2_features[unit.level], flow)
      cascaded.append(flow)
    flow = self.upsample(f1, f2, flow, self.size if size is None else size)
    cascaded.append(flow)
    return cascaded


class PlainResBlock(nn.Module):
  """Reference layers.py ResidualBlock with default InstanceNorm2d (no
  params) + ELU, resample=None (the get_double_res configuration)."""

  def __init__(self, cin, cout):
    super().__init__()
    self.cin, self.cout = cin, cout
    self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
    self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
    if cin != cout:
      self.shortcut = nn.Conv2d(cin, cout, 1)
    self.norm1 = nn.InstanceNorm2d(cin)
    self.norm2 = nn.InstanceNorm2d(cout)

  def forward(self, x):
    h = self.conv1(F.elu(self.norm1(x)))
    h = self.conv2(F.elu(self.norm2(h)))
    return (x if self.cin == self.cout else self.shortcut(x)) + h


def double_res(cin, cout):
  return nn.Sequential(PlainResBlock(cin, cin * 2),
                       PlainResBlock(cin * 2, cout))


class TorchPressureNet(nn.Module):

  def __init__(self, config):
    super().__init__()
    channels = list(config.model.feature_nums)
    self.channels = channels
    ff = self.flow_feature_nums = 32
    self.omega = config.model.spatial_embed_omega
    self.s = config.model.spatial_embed_s_pres
    self.flow_feature = double_res(3, ff)
    self.first = double_res(ff, channels[0])
    down, ch_i = [], channels[0]
    for ch_o in channels[1:]:
      down.append(nn.Sequential(nn.MaxPool2d(2), double_res(ch_i, ch_o)))
      ch_i = ch_o
    self.down = nn.ModuleList(down)
    up, up_conv, ch_i = [], [], channels[-1]
    for ch_o in channels[-2::-1]:
      up.append(nn.Sequential(nn.ConvTranspose2d(ch_i, ch_o, 2, stride=2)))
      up_conv.append(double_res(ch_o * 2 + ff, ch_o))
      ch_i = ch_o
    self.up = nn.ModuleList(up)
    self.up_conv = nn.ModuleList(up_conv)
    self.end = nn.Sequential(
        double_res(channels[0], channels[0] // 2),
        nn.Conv2d(channels[0] // 2, channels[0] // 2, 1),
        double_res(channels[0] // 2, 1),
        nn.Conv2d(1, 1, 1))

  def norm_feature(self, flow):
    flow_norm = -(flow ** 2).sum(dim=1, keepdim=True)
    return self.flow_feature(torch.cat([flow, flow_norm], 1))

  def forward(self, cascaded_flow, x, y, t):
    temb = timestep_embedding(t, self.flow_feature_nums)[:, :, None, None]
    semb = spatial_embedding(x, y, self.omega, self.s)
    sembs = [semb]
    for _ in range(len(self.channels) - 2):
      semb = F.avg_pool2d(semb, 2, 2)
      sembs.append(semb)

    h = self.norm_feature(cascaded_flow[-1].detach()) + temb + sembs[0]
    h = self.first(h)
    features = [h]
    for down in self.down:
      h = down(h)
      features.append(h)
    features.pop(-1)
    for idx in range(len(features)):
      feature = features[-1 - idx]
      flow_feature = (self.norm_feature(cascaded_flow[idx + 2].detach())
                      + temb + sembs[-1 - idx])
      h = self.up[idx](h)
      h = self.up_conv[idx](torch.cat([feature, h, flow_feature], 1))
    return self.end(h)


class TorchPINN(nn.Module):
  """flownet + pressurenet composition (reference pinn_kalman/pinn.py:34-65
  minus the mask bookkeeping, which holds no parameters)."""

  def __init__(self, config):
    super().__init__()
    self.flownet = TorchFlowNet(config)
    self.pressurenet = TorchPressureNet(config)

  def forward(self, f1, f2, x, y, t, size=None):
    flow = self.flownet(f1, f2, x, y, t, size=size)
    pressure = self.pressurenet(flow, x, y, t)
    return flow, pressure
