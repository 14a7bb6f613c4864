"""Hand-written NCHW torch DDPM U-Net oracle for checkpoint-converter tests.

An independent PyTorch implementation of the DDPM score U-Net (Ho et al.
2020 / Song et al. ICLR'21) whose ``state_dict()`` keys follow the reference
checkpoint format — ``all_modules.{i}.<attr>.<param>`` with the flat
module-list ordering of reference models/ddpm.py:58-106 and the per-block
attribute names of reference models/layers.py (``GroupNorm_0``, ``Conv_0``,
``Dense_0``, ``NIN_0`` …).  Those names and that ordering ARE the checkpoint
format under test (`models/torch_port.py`); the forward math here is written
independently in plain NCHW torch ops, so output agreement with the NHWC
flax model after conversion cross-validates kernel transposes, GroupNorm
eps/grouping, the attention math, resampling paddings, and the walk order.

Dropout is a no-op in ``eval()`` mode — parity tests run there.
"""

import math

import torch
import torch.nn.functional as F
from torch import nn


def timestep_embedding(t, dim, max_positions=10000):
  half = dim // 2
  freqs = torch.exp(
      torch.arange(half, dtype=torch.float32)
      * -(math.log(max_positions) / (half - 1)))
  args = t.float()[:, None] * freqs[None, :]
  return torch.cat([torch.sin(args), torch.cos(args)], dim=1)


class NIN(nn.Module):
  """Per-pixel dense over channels; params W (in, out) and b."""

  def __init__(self, cin, cout):
    super().__init__()
    self.W = nn.Parameter(torch.randn(cin, cout) * 0.05)
    self.b = nn.Parameter(torch.zeros(cout))

  def forward(self, x):
    return torch.einsum('bchw,cd->bdhw', x, self.W) \
        + self.b[None, :, None, None]


class AttnBlock(nn.Module):

  def __init__(self, c):
    super().__init__()
    self.GroupNorm_0 = nn.GroupNorm(32, c, eps=1e-6)
    self.NIN_0 = NIN(c, c)
    self.NIN_1 = NIN(c, c)
    self.NIN_2 = NIN(c, c)
    self.NIN_3 = NIN(c, c)

  def forward(self, x):
    B, C, H, W = x.shape
    h = self.GroupNorm_0(x)
    q = self.NIN_0(h).reshape(B, C, H * W)
    k = self.NIN_1(h).reshape(B, C, H * W)
    v = self.NIN_2(h).reshape(B, C, H * W)
    w = torch.softmax(torch.bmm(q.permute(0, 2, 1), k) / math.sqrt(C), dim=-1)
    h = torch.bmm(v, w.permute(0, 2, 1)).reshape(B, C, H, W)
    return x + self.NIN_3(h)


class ResnetBlockDDPM(nn.Module):

  def __init__(self, act, cin, cout, temb_dim, dropout=0.1):
    super().__init__()
    self.act = act
    self.GroupNorm_0 = nn.GroupNorm(32, cin, eps=1e-6)
    self.Conv_0 = nn.Conv2d(cin, cout, 3, padding=1)
    self.Dense_0 = nn.Linear(temb_dim, cout)
    self.GroupNorm_1 = nn.GroupNorm(32, cout, eps=1e-6)
    self.Dropout_0 = nn.Dropout(dropout)
    self.Conv_1 = nn.Conv2d(cout, cout, 3, padding=1)
    if cin != cout:
      self.NIN_0 = NIN(cin, cout)
    self.cin, self.cout = cin, cout

  def forward(self, x, temb):
    h = self.Conv_0(self.act(self.GroupNorm_0(x)))
    h = h + self.Dense_0(self.act(temb))[:, :, None, None]
    h = self.Conv_1(self.Dropout_0(self.act(self.GroupNorm_1(h))))
    if self.cin != self.cout:
      x = self.NIN_0(x)
    return x + h


class Downsample(nn.Module):
  """x2: asymmetric (0,1) pad + stride-2 VALID conv, or 2x2 avg pool."""

  def __init__(self, c, with_conv):
    super().__init__()
    if with_conv:
      self.Conv_0 = nn.Conv2d(c, c, 3, stride=2, padding=0)
    self.with_conv = with_conv

  def forward(self, x):
    if self.with_conv:
      return self.Conv_0(F.pad(x, (0, 1, 0, 1)))
    return F.avg_pool2d(x, 2)


class Upsample(nn.Module):
  """x2 nearest, optional SAME 3x3 conv."""

  def __init__(self, c, with_conv):
    super().__init__()
    if with_conv:
      self.Conv_0 = nn.Conv2d(c, c, 3, padding=1)
    self.with_conv = with_conv

  def forward(self, x):
    h = F.interpolate(x, scale_factor=2, mode='nearest')
    return self.Conv_0(h) if self.with_conv else h


class TorchDDPM(nn.Module):
  """Reference-checkpoint-shaped DDPM U-Net (conditional, swish act)."""

  def __init__(self, *, nf, ch_mult, num_res_blocks, attn_resolutions,
               image_size, channels, resamp_with_conv=True, dropout=0.1,
               centered=True, scale_by_sigma=False, sigmas=None):
    super().__init__()
    self.act = act = F.silu
    self.nf = nf
    self.num_res_blocks = num_res_blocks
    self.attn_resolutions = tuple(attn_resolutions)
    self.num_resolutions = num_resolutions = len(ch_mult)
    self.centered = centered
    self.scale_by_sigma = scale_by_sigma
    all_res = [image_size // (2 ** i) for i in range(num_resolutions)]
    self.register_buffer(
        'sigmas',
        torch.as_tensor(sigmas if sigmas is not None else [1.0],
                        dtype=torch.float32))

    temb_dim = 4 * nf
    mods = [nn.Linear(nf, temb_dim), nn.Linear(temb_dim, temb_dim),
            nn.Conv2d(channels, nf, 3, padding=1)]
    hs_c = [nf]
    cin = nf
    for i_level in range(num_resolutions):
      for _ in range(num_res_blocks):
        cout = nf * ch_mult[i_level]
        mods.append(ResnetBlockDDPM(act, cin, cout, temb_dim, dropout))
        cin = cout
        if all_res[i_level] in self.attn_resolutions:
          mods.append(AttnBlock(cin))
        hs_c.append(cin)
      if i_level != num_resolutions - 1:
        mods.append(Downsample(cin, resamp_with_conv))
        hs_c.append(cin)
    mods += [ResnetBlockDDPM(act, cin, cin, temb_dim, dropout),
             AttnBlock(cin),
             ResnetBlockDDPM(act, cin, cin, temb_dim, dropout)]
    for i_level in reversed(range(num_resolutions)):
      for _ in range(num_res_blocks + 1):
        cout = nf * ch_mult[i_level]
        mods.append(ResnetBlockDDPM(act, cin + hs_c.pop(), cout, temb_dim,
                                    dropout))
        cin = cout
      if all_res[i_level] in self.attn_resolutions:
        mods.append(AttnBlock(cin))
      if i_level != 0:
        mods.append(Upsample(cin, resamp_with_conv))
    assert not hs_c
    mods += [nn.GroupNorm(32, cin, eps=1e-6),
             nn.Conv2d(cin, channels, 3, padding=1)]
    self.all_modules = nn.ModuleList(mods)

  def forward(self, x, labels):
    mods = iter(self.all_modules)
    temb = timestep_embedding(labels, self.nf)
    temb = next(mods)(temb)
    temb = next(mods)(self.act(temb))

    h = x if self.centered else 2 * x - 1.0
    hs = [next(mods)(h)]
    for i_level in range(self.num_resolutions):
      for _ in range(self.num_res_blocks):
        h = next(mods)(hs[-1], temb)
        if h.shape[-1] in self.attn_resolutions:
          h = next(mods)(h)
        hs.append(h)
      if i_level != self.num_resolutions - 1:
        hs.append(next(mods)(hs[-1]))

    h = next(mods)(hs[-1], temb)
    h = next(mods)(h)
    h = next(mods)(h, temb)

    for i_level in reversed(range(self.num_resolutions)):
      for _ in range(self.num_res_blocks + 1):
        h = next(mods)(torch.cat([h, hs.pop()], dim=1), temb)
      if h.shape[-1] in self.attn_resolutions:
        h = next(mods)(h)
      if i_level != 0:
        h = next(mods)(h)
    assert not hs

    h = self.act(next(mods)(h))
    h = next(mods)(h)
    assert next(mods, None) is None

    if self.scale_by_sigma:
      h = h / self.sigmas[labels.long(), None, None, None]
    return h
