"""Hand-written NCHW torch NCSN++ oracle for checkpoint-converter tests.

An independent PyTorch implementation of NCSN++ (Song et al. ICLR'21)
whose ``state_dict()`` keys follow the reference checkpoint format — the
flat ``all_modules.{i}`` ordering of reference models/ncsnpp.py:68-230 with
the per-block attribute names of reference models/layerspp.py
(``GroupNorm_0``, ``Conv_0``, ``Dense_0``, ``NIN_0``, ``Conv2d_0`` …).
Those names and that ordering ARE the checkpoint format under test
(``torch_port.ncsnpp_params_from_torch_state_dict``); the forward math —
including the FIR upfirdn resampling pipeline — is written independently in
plain NCHW torch ops, so output agreement with the NHWC flax model after
conversion cross-validates the walk order, kernel transposes, the fused
FIR up/down convolutions, GroupNorm group-count conventions, skip
rescaling, and the progressive pyramid plumbing.

Covers every constructor axis the reference switches on: biggan/ddpm
resblocks, fourier/positional embeddings, fir/naive resampling, and the
progressive / progressive_input pyramid variants.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

from tests.torch_ddpm_oracle import NIN, timestep_embedding


# ---------------------------------------------------------------------------
# FIR resampling twins (NCHW): same semantics as ops/upfirdn2d.py /
# ops/resample.py, written from the op definition (zero-stuff, pad,
# convolve with the FIR filter, subsample).
# ---------------------------------------------------------------------------


def _setup_kernel(k):
  k = np.asarray(k, np.float32)
  if k.ndim == 1:
    k = np.outer(k, k)
  return torch.from_numpy(k / k.sum())


def _upfirdn2d_t(x, k2d, up=1, down=1, pad=(0, 0)):
  B, C, H, W = x.shape
  if up > 1:
    out = x.reshape(B, C, H, 1, W, 1)
    out = F.pad(out, (0, up - 1, 0, 0, 0, up - 1))
    x = out.reshape(B, C, H * up, W * up)
  p0, p1 = pad
  x = F.pad(x, (max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)))
  x = x[:, :, max(-p0, 0): x.shape[2] - max(-p1, 0),
        max(-p0, 0): x.shape[3] - max(-p1, 0)]
  kh, kw = k2d.shape
  w = torch.flip(k2d, (0, 1)).reshape(1, 1, kh, kw).to(x.dtype)
  x = F.conv2d(x.reshape(B * C, 1, *x.shape[2:]), w)
  x = x.reshape(B, C, *x.shape[2:])
  return x[:, :, ::down, ::down]


def _upsample_2d_t(x, k, factor=2, gain=1.0):
  k2d = _setup_kernel(k) * (gain * factor ** 2)
  p = k2d.shape[0] - factor
  return _upfirdn2d_t(x, k2d, up=factor,
                      pad=((p + 1) // 2 + factor - 1, p // 2))


def _downsample_2d_t(x, k, factor=2, gain=1.0):
  k2d = _setup_kernel(k) * gain
  p = k2d.shape[0] - factor
  return _upfirdn2d_t(x, k2d, down=factor, pad=((p + 1) // 2, p // 2))


def _upsample_conv_2d_t(x, w, k, factor=2, gain=1.0):
  """Fused transpose-conv upsample + FIR.  ``w`` is OIHW and CORRELATES
  with the zero-stuffed input (the net semantics of ops/resample.py:56-76,
  which the reference's flip-permute-conv_transpose dance also computes)."""
  convH = w.shape[-1]
  k2d = _setup_kernel(k) * (gain * factor ** 2)
  p = (k2d.shape[0] - factor) - (convH - 1)
  B, C, H, W = x.shape
  xd = x.new_zeros(B, C, (H - 1) * factor + 1, (W - 1) * factor + 1)
  xd[:, :, ::factor, ::factor] = x
  xd = F.pad(xd, (convH - 1,) * 4)
  x = F.conv2d(xd, w)
  return _upfirdn2d_t(x, k2d, pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def _conv_downsample_2d_t(x, w, k, factor=2, gain=1.0):
  convH = w.shape[-1]
  k2d = _setup_kernel(k) * gain
  p = (k2d.shape[0] - factor) + (convH - 1)
  x = _upfirdn2d_t(x, k2d, pad=((p + 1) // 2, p // 2))
  return F.conv2d(x, w, stride=factor)


class FirConv2d(nn.Module):
  """Conv with optional fused FIR up/downsampling; params ``weight`` (OIHW)
  + ``bias`` like reference up_or_down_sampling.Conv2d:23-56."""

  def __init__(self, cin, cout, kernel, up=False, down=False,
               resample_kernel=(1, 3, 3, 1)):
    super().__init__()
    assert not (up and down)
    self.weight = nn.Parameter(torch.randn(cout, cin, kernel, kernel) * 0.02)
    self.bias = nn.Parameter(torch.zeros(cout))
    self.up, self.down = up, down
    self.k = tuple(resample_kernel)
    self.kernel = kernel

  def forward(self, x):
    if self.up:
      x = _upsample_conv_2d_t(x, self.weight, self.k)
    elif self.down:
      x = _conv_downsample_2d_t(x, self.weight, self.k)
    else:
      x = F.conv2d(x, self.weight, padding=self.kernel // 2)
    return x + self.bias.reshape(1, -1, 1, 1)


# ---------------------------------------------------------------------------
# Blocks (reference layerspp.py attribute names = the checkpoint format).
# ---------------------------------------------------------------------------


def _gn(c):
  return nn.GroupNorm(max(min(c // 4, 32), 1), c, eps=1e-6)


class GaussianFourier(nn.Module):

  def __init__(self, embedding_size, scale):
    super().__init__()
    self.W = nn.Parameter(torch.randn(embedding_size) * scale,
                          requires_grad=False)

  def forward(self, x):
    x_proj = x[:, None] * self.W[None, :] * 2 * math.pi
    return torch.cat([torch.sin(x_proj), torch.cos(x_proj)], dim=-1)


class Combine(nn.Module):

  def __init__(self, dim1, dim2, method='cat'):
    super().__init__()
    self.Conv_0 = nn.Conv2d(dim1, dim2, 1)
    self.method = method

  def forward(self, x, y):
    h = self.Conv_0(x)
    return torch.cat([h, y], dim=1) if self.method == 'cat' else h + y


class AttnBlockpp(nn.Module):

  def __init__(self, c, skip_rescale=True):
    super().__init__()
    self.GroupNorm_0 = _gn(c)
    self.NIN_0 = NIN(c, c)
    self.NIN_1 = NIN(c, c)
    self.NIN_2 = NIN(c, c)
    self.NIN_3 = NIN(c, c)
    self.skip_rescale = skip_rescale

  def forward(self, x):
    B, C, H, W = x.shape
    h = self.GroupNorm_0(x)
    q = self.NIN_0(h).reshape(B, C, H * W)
    k = self.NIN_1(h).reshape(B, C, H * W)
    v = self.NIN_2(h).reshape(B, C, H * W)
    w = torch.softmax(torch.bmm(q.permute(0, 2, 1), k) / math.sqrt(C), dim=-1)
    h = torch.bmm(v, w.permute(0, 2, 1)).reshape(B, C, H, W)
    h = self.NIN_3(h)
    out = x + h
    return out / math.sqrt(2.) if self.skip_rescale else out


class UpsamplePP(nn.Module):
  """reference layerspp.Upsample:94-126 twin (all four fir/conv variants)."""

  def __init__(self, cin, cout, with_conv, fir, fir_kernel=(1, 3, 3, 1)):
    super().__init__()
    if with_conv:
      if fir:
        self.Conv2d_0 = FirConv2d(cin, cout, 3, up=True,
                                  resample_kernel=fir_kernel)
      else:
        self.Conv_0 = nn.Conv2d(cin, cout, 3, padding=1)
    self.with_conv, self.fir, self.k = with_conv, fir, tuple(fir_kernel)

  def forward(self, x):
    if not self.fir:
      h = F.interpolate(x, scale_factor=2, mode='nearest')
      return self.Conv_0(h) if self.with_conv else h
    if not self.with_conv:
      return _upsample_2d_t(x, self.k)
    return self.Conv2d_0(x)


class DownsamplePP(nn.Module):
  """reference layerspp.Downsample:129-163 twin."""

  def __init__(self, cin, cout, with_conv, fir, fir_kernel=(1, 3, 3, 1)):
    super().__init__()
    if with_conv:
      if fir:
        self.Conv2d_0 = FirConv2d(cin, cout, 3, down=True,
                                  resample_kernel=fir_kernel)
      else:
        self.Conv_0 = nn.Conv2d(cin, cout, 3, stride=2, padding=0)
    self.with_conv, self.fir, self.k = with_conv, fir, tuple(fir_kernel)

  def forward(self, x):
    if not self.fir:
      if self.with_conv:
        return self.Conv_0(F.pad(x, (0, 1, 0, 1)))
      return F.avg_pool2d(x, 2)
    if not self.with_conv:
      return _downsample_2d_t(x, self.k)
    return self.Conv2d_0(x)


class ResnetBlockDDPMpp(nn.Module):

  def __init__(self, act, cin, cout, temb_dim, dropout=0.1,
               skip_rescale=False):
    super().__init__()
    self.act = act
    self.GroupNorm_0 = _gn(cin)
    self.Conv_0 = nn.Conv2d(cin, cout, 3, padding=1)
    if temb_dim:
      self.Dense_0 = nn.Linear(temb_dim, cout)
    self.GroupNorm_1 = _gn(cout)
    self.Dropout_0 = nn.Dropout(dropout)
    self.Conv_1 = nn.Conv2d(cout, cout, 3, padding=1)
    if cin != cout:
      self.NIN_0 = NIN(cin, cout)
    self.cin, self.cout, self.skip_rescale = cin, cout, skip_rescale

  def forward(self, x, temb):
    h = self.Conv_0(self.act(self.GroupNorm_0(x)))
    if temb is not None:
      h = h + self.Dense_0(self.act(temb))[:, :, None, None]
    h = self.Conv_1(self.Dropout_0(self.act(self.GroupNorm_1(h))))
    if self.cin != self.cout:
      x = self.NIN_0(x)
    out = x + h
    return out / math.sqrt(2.) if self.skip_rescale else out


class ResnetBlockBigGANpp(nn.Module):

  def __init__(self, act, cin, cout, temb_dim, up=False, down=False,
               fir=False, fir_kernel=(1, 3, 3, 1), dropout=0.1,
               skip_rescale=True):
    super().__init__()
    self.act = act
    self.GroupNorm_0 = _gn(cin)
    self.Conv_0 = nn.Conv2d(cin, cout, 3, padding=1)
    if temb_dim:
      self.Dense_0 = nn.Linear(temb_dim, cout)
    self.GroupNorm_1 = _gn(cout)
    self.Dropout_0 = nn.Dropout(dropout)
    self.Conv_1 = nn.Conv2d(cout, cout, 3, padding=1)
    if cin != cout or up or down:
      self.Conv_2 = nn.Conv2d(cin, cout, 1)
    self.cin, self.cout = cin, cout
    self.up, self.down, self.fir, self.k = up, down, fir, tuple(fir_kernel)
    self.skip_rescale = skip_rescale

  def _resample(self, t):
    if self.up:
      return (_upsample_2d_t(t, self.k) if self.fir
              else F.interpolate(t, scale_factor=2, mode='nearest'))
    if self.down:
      return _downsample_2d_t(t, self.k) if self.fir else F.avg_pool2d(t, 2)
    return t

  def forward(self, x, temb):
    h = self.act(self.GroupNorm_0(x))
    h = self._resample(h)
    x = self._resample(x)
    h = self.Conv_0(h)
    if temb is not None:
      h = h + self.Dense_0(self.act(temb))[:, :, None, None]
    h = self.Conv_1(self.Dropout_0(self.act(self.GroupNorm_1(h))))
    if self.cin != self.cout or self.up or self.down:
      x = self.Conv_2(x)
    out = x + h
    return out / math.sqrt(2.) if self.skip_rescale else out


# ---------------------------------------------------------------------------
# Full model: flat all_modules list in reference ctor order
# (reference models/ncsnpp.py:68-230), forward replays it sequentially
# (:232-381).
# ---------------------------------------------------------------------------


class TorchNCSNpp(nn.Module):
  """Reference-checkpoint-shaped NCSN++ (swish act)."""

  def __init__(self, config, sigmas):
    super().__init__()
    self.config = config
    self.act = act = F.silu
    self.register_buffer('sigmas',
                         torch.as_tensor(np.asarray(sigmas, np.float32)))
    m = config.model
    self.nf = nf = m.nf
    ch_mult = m.ch_mult
    self.num_res_blocks = m.num_res_blocks
    self.attn_resolutions = tuple(m.attn_resolutions)
    self.num_resolutions = num_resolutions = len(ch_mult)
    all_res = [config.data.image_size // (2 ** i)
               for i in range(num_resolutions)]
    self.conditional = m.conditional
    fir, fir_kernel = m.fir, tuple(m.fir_kernel)
    self.skip_rescale = sr = m.skip_rescale
    self.resblock_type = rb = m.resblock_type.lower()
    self.progressive = prog = m.progressive.lower()
    self.progressive_input = prog_in = m.progressive_input.lower()
    self.embedding_type = m.embedding_type.lower()
    combine = m.progressive_combine.lower()
    dropout = m.dropout
    channels = config.data.num_channels
    temb_dim = nf * 4 if m.conditional else None

    def resblock(cin, cout, up=False, down=False):
      if rb == 'biggan':
        return ResnetBlockBigGANpp(act, cin, cout, temb_dim, up=up, down=down,
                                   fir=fir, fir_kernel=fir_kernel,
                                   dropout=dropout, skip_rescale=sr)
      assert not (up or down)
      return ResnetBlockDDPMpp(act, cin, cout, temb_dim, dropout=dropout,
                               skip_rescale=sr)

    mods = []
    if self.embedding_type == 'fourier':
      mods.append(GaussianFourier(nf, m.fourier_scale))
    if m.conditional:
      embed_dim = 2 * nf if self.embedding_type == 'fourier' else nf
      mods += [nn.Linear(embed_dim, nf * 4), nn.Linear(nf * 4, nf * 4)]

    if prog == 'output_skip':
      self.pyramid_upsample = UpsamplePP(0, 0, with_conv=False, fir=fir,
                                         fir_kernel=fir_kernel)
    if prog_in == 'input_skip':
      self.pyramid_downsample = DownsamplePP(0, 0, with_conv=False, fir=fir,
                                             fir_kernel=fir_kernel)

    mods.append(nn.Conv2d(channels, nf, 3, padding=1))
    hs_c = [nf]
    cin = nf
    input_pyramid_ch = channels
    for i_level in range(num_resolutions):
      for _ in range(m.num_res_blocks):
        cout = nf * ch_mult[i_level]
        mods.append(resblock(cin, cout))
        cin = cout
        if all_res[i_level] in self.attn_resolutions:
          mods.append(AttnBlockpp(cin, skip_rescale=sr))
        hs_c.append(cin)
      if i_level != num_resolutions - 1:
        if rb == 'ddpm':
          mods.append(DownsamplePP(cin, cin, with_conv=m.resamp_with_conv,
                                   fir=fir, fir_kernel=fir_kernel))
        else:
          mods.append(resblock(cin, cin, down=True))
        if prog_in == 'input_skip':
          mods.append(Combine(input_pyramid_ch, cin, method=combine))
          if combine == 'cat':
            cin *= 2
        elif prog_in == 'residual':
          mods.append(DownsamplePP(input_pyramid_ch, cin, with_conv=True,
                                   fir=fir, fir_kernel=fir_kernel))
          input_pyramid_ch = cin
        hs_c.append(cin)

    mods += [resblock(cin, cin), AttnBlockpp(cin, skip_rescale=sr),
             resblock(cin, cin)]

    pyramid_ch = 0
    for i_level in reversed(range(num_resolutions)):
      for _ in range(m.num_res_blocks + 1):
        cout = nf * ch_mult[i_level]
        mods.append(resblock(cin + hs_c.pop(), cout))
        cin = cout
      if all_res[i_level] in self.attn_resolutions:
        mods.append(AttnBlockpp(cin, skip_rescale=sr))
      if prog != 'none':
        if i_level == num_resolutions - 1:
          mods.append(_gn(cin))
          mods.append(nn.Conv2d(
              cin, channels if prog == 'output_skip' else cin, 3, padding=1))
          pyramid_ch = channels if prog == 'output_skip' else cin
        else:
          if prog == 'output_skip':
            mods.append(_gn(cin))
            mods.append(nn.Conv2d(cin, channels, 3, padding=1))
            pyramid_ch = channels
          else:
            mods.append(UpsamplePP(pyramid_ch, cin, with_conv=True, fir=fir,
                                   fir_kernel=fir_kernel))
            pyramid_ch = cin
      if i_level != 0:
        if rb == 'ddpm':
          mods.append(UpsamplePP(cin, cin, with_conv=m.resamp_with_conv,
                                 fir=fir, fir_kernel=fir_kernel))
        else:
          mods.append(resblock(cin, cin, up=True))
    assert not hs_c

    if prog != 'output_skip':
      mods += [_gn(cin), nn.Conv2d(cin, channels, 3, padding=1)]
    self.all_modules = nn.ModuleList(mods)

  def forward(self, x, time_cond):
    mods = iter(self.all_modules)
    if self.embedding_type == 'fourier':
      used_sigmas = time_cond
      temb = next(mods)(torch.log(used_sigmas))
    else:
      used_sigmas = self.sigmas[time_cond.long()]
      temb = timestep_embedding(time_cond, self.nf)
    if self.conditional:
      temb = next(mods)(temb)
      temb = next(mods)(self.act(temb))
    else:
      temb = None

    if not self.config.data.centered:
      x = 2 * x - 1.

    input_pyramid = x if self.progressive_input != 'none' else None
    hs = [next(mods)(x)]
    for i_level in range(self.num_resolutions):
      for _ in range(self.num_res_blocks):
        h = next(mods)(hs[-1], temb)
        if h.shape[-1] in self.attn_resolutions:
          h = next(mods)(h)
        hs.append(h)
      if i_level != self.num_resolutions - 1:
        if self.resblock_type == 'ddpm':
          h = next(mods)(hs[-1])
        else:
          h = next(mods)(hs[-1], temb)
        if self.progressive_input == 'input_skip':
          input_pyramid = self.pyramid_downsample(input_pyramid)
          h = next(mods)(input_pyramid, h)
        elif self.progressive_input == 'residual':
          input_pyramid = next(mods)(input_pyramid)
          input_pyramid = ((input_pyramid + h) / math.sqrt(2.)
                           if self.skip_rescale else input_pyramid + h)
          h = input_pyramid
        hs.append(h)

    h = next(mods)(hs[-1], temb)
    h = next(mods)(h)
    h = next(mods)(h, temb)

    pyramid = None
    for i_level in reversed(range(self.num_resolutions)):
      for _ in range(self.num_res_blocks + 1):
        h = next(mods)(torch.cat([h, hs.pop()], dim=1), temb)
      if h.shape[-1] in self.attn_resolutions:
        h = next(mods)(h)
      if self.progressive != 'none':
        if i_level == self.num_resolutions - 1:
          pyramid = self.act(next(mods)(h))
          pyramid = next(mods)(pyramid)
        else:
          if self.progressive == 'output_skip':
            pyramid = self.pyramid_upsample(pyramid)
            pyramid_h = self.act(next(mods)(h))
            pyramid_h = next(mods)(pyramid_h)
            pyramid = pyramid + pyramid_h
          else:
            pyramid = next(mods)(pyramid)
            pyramid = ((pyramid + h) / math.sqrt(2.)
                       if self.skip_rescale else pyramid + h)
            h = pyramid
      if i_level != 0:
        if self.resblock_type == 'ddpm':
          h = next(mods)(h)
        else:
          h = next(mods)(h, temb)
    assert not hs

    if self.progressive == 'output_skip':
      h = pyramid
    else:
      h = self.act(next(mods)(h))
      h = next(mods)(h)
    assert next(mods, None) is None

    if self.config.model.scale_by_sigma:
      h = h / used_sigmas.reshape(-1, 1, 1, 1)
    return h
