"""Independent torch NCSNv2 oracle for checkpoint-converter parity tests.

Built from structurally independent pieces (plain NCHW torch modules) with
the REFERENCE's state-dict key layout (reference models/ncsnv2.py attribute
names; models/layers.py:123-300 RCU/CRP/MSF/Refine setattr+ModuleList
naming; models/normalization.py:157-183 InstanceNorm2dPlus) so that
`torch_port.ncsnv2_params_from_torch_state_dict` can be validated against a
genuinely separate implementation, mirroring tests/torch_ddpm_oracle.py.

Dilated-conv convention — a real divergence, verified by running the
reference's own modules: reference ``ncsn_conv3x3`` keeps ``padding=1``
for every dilation (reference layers.py:104-110), which shrinks spatial
dims by 2(d-1) per conv and makes EVERY NCSNv2 variant crash at the first
dilated residual add (torch: "size of tensor a (16) must match ... (12)");
the family is dead code as written.  The functional convention — and the
original upstream NCSNv2's — is ``padding=dilation``, which is what both
our flax layers_ncsn.NCSNConv and this oracle use.  Padding carries no
parameters, so state-dict keys (and hence the converter) are identical
either way.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def conv3x3(cin, cout, bias=True, dilation=1):
  return nn.Conv2d(cin, cout, 3, padding=dilation, dilation=dilation,
                   bias=bias)


class InstanceNorm2dPlus(nn.Module):
  """InstanceNorm++ (reference normalization.py:157-183)."""

  def __init__(self, num_features, bias=True):
    super().__init__()
    self.num_features = num_features
    self.use_bias = bias
    self.alpha = nn.Parameter(torch.empty(num_features).normal_(1, 0.02))
    self.gamma = nn.Parameter(torch.empty(num_features).normal_(1, 0.02))
    if bias:
      self.beta = nn.Parameter(torch.zeros(num_features))

  def forward(self, x):
    means = x.mean(dim=(2, 3))                                   # (B, C)
    m = means.mean(dim=-1, keepdim=True)
    v = means.var(dim=-1, keepdim=True)                          # unbiased
    means = (means - m) / torch.sqrt(v + 1e-5)
    inst_m = x.mean(dim=(2, 3), keepdim=True)
    inst_v = x.var(dim=(2, 3), keepdim=True, unbiased=False)
    h = (x - inst_m) / torch.sqrt(inst_v + 1e-5)
    h = h + means[..., None, None] * self.alpha[None, :, None, None]
    out = self.gamma[None, :, None, None] * h
    if self.use_bias:
      out = out + self.beta[None, :, None, None]
    return out


class ConvMeanPool(nn.Module):
  """Conv then 2x2 mean pool (reference layers.py:339-354); adjust_padding
  wraps the conv in Sequential(ZeroPad2d((1,0,1,0)), conv) -> key '.conv.1'."""

  def __init__(self, cin, cout, kernel=3, adjust_padding=False):
    super().__init__()
    conv = nn.Conv2d(cin, cout, kernel, padding=kernel // 2)
    self.conv = (nn.Sequential(nn.ZeroPad2d((1, 0, 1, 0)), conv)
                 if adjust_padding else conv)

  def forward(self, x):
    out = self.conv(x)
    return (out[:, :, ::2, ::2] + out[:, :, 1::2, ::2]
            + out[:, :, ::2, 1::2] + out[:, :, 1::2, 1::2]) / 4.


class ResidualBlock(nn.Module):
  """Reference layers.py:438-492 (attribute names conv1/conv2/shortcut/
  normalize1/normalize2)."""

  def __init__(self, cin, cout, resample=None, dilation=1,
               adjust_padding=False):
    super().__init__()
    self.cin, self.cout, self.resample = cin, cout, resample
    if resample == 'down':
      if dilation > 1:
        self.conv1 = conv3x3(cin, cin, dilation=dilation)
        self.normalize2 = InstanceNorm2dPlus(cin)
        self.conv2 = conv3x3(cin, cout, dilation=dilation)
        self.shortcut = conv3x3(cin, cout, dilation=dilation)
      else:
        self.conv1 = conv3x3(cin, cin)
        self.normalize2 = InstanceNorm2dPlus(cin)
        self.conv2 = ConvMeanPool(cin, cout, 3, adjust_padding)
        self.shortcut = ConvMeanPool(cin, cout, 1, adjust_padding)
    else:
      self.conv1 = conv3x3(cin, cout, dilation=dilation)
      self.normalize2 = InstanceNorm2dPlus(cout)
      self.conv2 = conv3x3(cout, cout, dilation=dilation)
      if cin != cout:
        self.shortcut = (conv3x3(cin, cout, dilation=dilation)
                         if dilation > 1 else nn.Conv2d(cin, cout, 1))
    self.normalize1 = InstanceNorm2dPlus(cin)

  def forward(self, x):
    h = F.elu(self.normalize1(x))
    h = self.conv1(h)
    h = F.elu(self.normalize2(h))
    h = self.conv2(h)
    if self.cin == self.cout and self.resample is None:
      return x + h
    return self.shortcut(x) + h


class RCUBlock(nn.Module):
  """Reference layers.py:173-194 (setattr names '{i+1}_{j+1}_conv').  The
  act is THREADED from the model config (reference RefineBlock passes the
  ctor act down — ELU for NCSNv2 configs, NOT the nn.ReLU default)."""

  def __init__(self, features, n_blocks, n_stages=2, act=F.elu):
    super().__init__()
    self.n_blocks, self.n_stages, self.act = n_blocks, n_stages, act
    for i in range(n_blocks):
      for j in range(n_stages):
        setattr(self, f'{i + 1}_{j + 1}_conv',
                conv3x3(features, features, bias=False))

  def forward(self, x):
    for i in range(self.n_blocks):
      residual = x
      for j in range(self.n_stages):
        x = getattr(self, f'{i + 1}_{j + 1}_conv')(self.act(x))
      x = x + residual
    return x


class CRPBlock(nn.Module):
  """Reference layers.py:123-144 (ModuleList 'convs', 5x5 max pool s=1)."""

  def __init__(self, features, n_stages=2, act=F.elu):
    super().__init__()
    self.act = act
    self.convs = nn.ModuleList(
        [conv3x3(features, features, bias=False) for _ in range(n_stages)])

  def forward(self, x):
    x = self.act(x)
    path = x
    for conv in self.convs:
      path = conv(F.max_pool2d(path, 5, stride=1, padding=2))
      x = path + x
    return x


class MSFBlock(nn.Module):
  """Reference layers.py:224-240 (ModuleList 'convs', bilinear
  align_corners=True fusion)."""

  def __init__(self, in_planes, features):
    super().__init__()
    self.features = features
    self.convs = nn.ModuleList(
        [conv3x3(c, features, bias=True) for c in in_planes])

  def forward(self, xs, shape):
    total = torch.zeros(xs[0].shape[0], self.features, *shape)
    for conv, x in zip(self.convs, xs):
      total = total + F.interpolate(conv(x), size=shape, mode='bilinear',
                                    align_corners=True)
    return total


class RefineBlock(nn.Module):
  """Reference layers.py:267-300 (attrs adapt_convs/output_convs/msf/crp)."""

  def __init__(self, in_planes, features, start=False, end=False,
               act=F.elu):
    super().__init__()
    self.n = len(in_planes)
    self.adapt_convs = nn.ModuleList(
        [RCUBlock(c, 2, act=act) for c in in_planes])
    self.output_convs = RCUBlock(features, 3 if end else 1, act=act)
    if not start:
      self.msf = MSFBlock(in_planes, features)
    self.crp = CRPBlock(features, act=act)

  def forward(self, xs, output_shape):
    hs = [rcu(x) for rcu, x in zip(self.adapt_convs, xs)]
    h = self.msf(hs, output_shape) if self.n > 1 else hs[0]
    return self.output_convs(self.crp(h))


# (name, cin, cout, resample, dilation, adjust) per two-block stage; the
# second block of each stage is always (cout, cout, None, dilation).
def _stage_specs(nf, size):
  if size < 96:
    stages = [('res1', nf, nf, None, 1, False),
              ('res2', nf, 2 * nf, 'down', 1, False),
              ('res3', 2 * nf, 2 * nf, 'down', 2, False),
              ('res4', 2 * nf, 2 * nf, 'down', 4, size == 28)]
    refines = [('refine1', [2 * nf], 2 * nf, True, False),
               ('refine2', [2 * nf, 2 * nf], 2 * nf, False, False),
               ('refine3', [2 * nf, 2 * nf], nf, False, False),
               ('refine4', [nf, nf], nf, False, True)]
  elif size <= 128:
    stages = [('res1', nf, nf, None, 1, False),
              ('res2', nf, 2 * nf, 'down', 1, False),
              ('res3', 2 * nf, 2 * nf, 'down', 1, False),
              ('res4', 2 * nf, 4 * nf, 'down', 2, False),
              ('res5', 4 * nf, 4 * nf, 'down', 4, False)]
    refines = [('refine1', [4 * nf], 4 * nf, True, False),
               ('refine2', [4 * nf, 4 * nf], 2 * nf, False, False),
               ('refine3', [2 * nf, 2 * nf], 2 * nf, False, False),
               ('refine4', [2 * nf, 2 * nf], nf, False, False),
               ('refine5', [nf, nf], nf, False, True)]
  else:
    stages = [('res1', nf, nf, None, 1, False),
              ('res2', nf, 2 * nf, 'down', 1, False),
              ('res3', 2 * nf, 2 * nf, 'down', 1, False),
              ('res31', 2 * nf, 2 * nf, 'down', 1, False),
              ('res4', 2 * nf, 4 * nf, 'down', 2, False),
              ('res5', 4 * nf, 4 * nf, 'down', 4, False)]
    refines = [('refine1', [4 * nf], 4 * nf, True, False),
               ('refine2', [4 * nf, 4 * nf], 2 * nf, False, False),
               ('refine31', [2 * nf, 2 * nf], 2 * nf, False, False),
               ('refine3', [2 * nf, 2 * nf], 2 * nf, False, False),
               ('refine4', [2 * nf, 2 * nf], nf, False, False),
               ('refine5', [nf, nf], nf, False, True)]
  return stages, refines


class TorchNCSNv2(nn.Module):
  """Size-dispatched NCSNv2 oracle (reference models/ncsnv2.py:44-132,
  :221-312, :315-414), NCHW, reference state-dict keys."""

  def __init__(self, config, sigmas):
    super().__init__()
    nf = config.model.nf
    size = config.data.image_size
    C = config.data.num_channels
    self.centered = config.data.centered
    self.register_buffer(
        'sigmas', torch.as_tensor(sigmas, dtype=torch.float32))
    self.begin_conv = nn.Conv2d(C, nf, 3, padding=1)
    self.normalizer = InstanceNorm2dPlus(nf)
    self.end_conv = nn.Conv2d(nf, C, 3, padding=1)

    stages, refines = _stage_specs(nf, size)
    self.stage_names = [s[0] for s in stages]
    self.refine_names = [r[0] for r in refines]  # FORWARD order (256: refine31
    #                                              between refine2 and refine3)
    for name, cin, cout, resample, dil, adj in stages:
      setattr(self, name, nn.ModuleList([
          ResidualBlock(cin, cout, resample, dil, adj),
          ResidualBlock(cout, cout, None, dil)]))
    for name, in_planes, feats, start, end in refines:
      setattr(self, name, RefineBlock(in_planes, feats, start, end))

  def forward(self, x, y):
    h = x if self.centered else 2 * x - 1.
    out = self.begin_conv(h)
    outs = []
    for name in self.stage_names:
      for blk in getattr(self, name):
        out = blk(out)
      outs.append(out)
    ref = getattr(self, self.refine_names[0])([outs[-1]], outs[-1].shape[2:])
    for name, layer in zip(self.refine_names[1:], reversed(outs[:-1])):
      ref = getattr(self, name)([layer, ref], layer.shape[2:])
    out = self.end_conv(F.elu(self.normalizer(ref)))
    used = self.sigmas[y].view(x.shape[0], 1, 1, 1)
    return out / used


# ---------------------------------------------------------------------------
# Class-conditional NCSN v1 (reference ncsnv2.py:136-218; the conditional
# layer family reference layers.py:147-336 + normalization.py:186-215).
# The reference's own ConditionalResidualBlock cannot even be CONSTRUCTED:
# its ``dilation=None`` default makes every ``dilation > 1`` comparison a
# TypeError (layers.py:384,392) — on top of the padding-under-dilation bug
# above.  Same functional-convention rules as the unconditional oracle.
# ---------------------------------------------------------------------------


class ConditionalInstanceNorm2dPlus(nn.Module):
  """Reference normalization.py:186-215 (embedding -> gamma/alpha/beta)."""

  def __init__(self, num_features, num_classes, bias=True):
    super().__init__()
    self.num_features = num_features
    self.use_bias = bias
    if bias:
      self.embed = nn.Embedding(num_classes, num_features * 3)
      self.embed.weight.data[:, :2 * num_features].normal_(1, 0.02)
      self.embed.weight.data[:, 2 * num_features:].zero_()
    else:
      self.embed = nn.Embedding(num_classes, 2 * num_features)
      self.embed.weight.data.normal_(1, 0.02)

  def forward(self, x, y):
    means = x.mean(dim=(2, 3))
    m = means.mean(dim=-1, keepdim=True)
    v = means.var(dim=-1, keepdim=True)
    means = (means - m) / torch.sqrt(v + 1e-5)
    inst_m = x.mean(dim=(2, 3), keepdim=True)
    inst_v = x.var(dim=(2, 3), keepdim=True, unbiased=False)
    h = (x - inst_m) / torch.sqrt(inst_v + 1e-5)
    if self.use_bias:
      gamma, alpha, beta = self.embed(y).chunk(3, dim=-1)
    else:
      gamma, alpha = self.embed(y).chunk(2, dim=-1)
      beta = None
    h = h + means[..., None, None] * alpha[..., None, None]
    out = gamma[..., None, None] * h
    if beta is not None:
      out = out + beta[..., None, None]
    return out


class ConditionalResidualBlock(nn.Module):
  """Reference layers.py:382-435 (same conv topology as ResidualBlock,
  embedding norms)."""

  def __init__(self, cin, cout, num_classes, resample=None, dilation=1,
               adjust_padding=False):
    super().__init__()
    self.cin, self.cout, self.resample = cin, cout, resample
    if resample == 'down':
      if dilation > 1:
        self.conv1 = conv3x3(cin, cin, dilation=dilation)
        self.normalize2 = ConditionalInstanceNorm2dPlus(cin, num_classes)
        self.conv2 = conv3x3(cin, cout, dilation=dilation)
        self.shortcut = conv3x3(cin, cout, dilation=dilation)
      else:
        self.conv1 = conv3x3(cin, cin)
        self.normalize2 = ConditionalInstanceNorm2dPlus(cin, num_classes)
        self.conv2 = ConvMeanPool(cin, cout, 3, adjust_padding)
        self.shortcut = ConvMeanPool(cin, cout, 1, adjust_padding)
    else:
      self.conv1 = conv3x3(cin, cout, dilation=dilation)
      self.normalize2 = ConditionalInstanceNorm2dPlus(cout, num_classes)
      self.conv2 = conv3x3(cout, cout, dilation=dilation)
      if cin != cout:
        self.shortcut = conv3x3(cin, cout, dilation=dilation)
    self.normalize1 = ConditionalInstanceNorm2dPlus(cin, num_classes)

  def forward(self, x, y):
    h = F.elu(self.normalize1(x, y))
    h = self.conv1(h)
    h = F.elu(self.normalize2(h, y))
    h = self.conv2(h)
    if self.cin == self.cout and self.resample is None:
      return x + h
    return self.shortcut(x) + h


class CondRCUBlock(nn.Module):
  """Reference layers.py:197-221 ('{i}_{j}_norm'/'{i}_{j}_conv' pairs)."""

  def __init__(self, features, n_blocks, num_classes, n_stages=2,
               act=F.elu):
    super().__init__()
    self.n_blocks, self.n_stages, self.act = n_blocks, n_stages, act
    for i in range(n_blocks):
      for j in range(n_stages):
        setattr(self, f'{i + 1}_{j + 1}_norm',
                ConditionalInstanceNorm2dPlus(features, num_classes))
        setattr(self, f'{i + 1}_{j + 1}_conv',
                conv3x3(features, features, bias=False))

  def forward(self, x, y):
    for i in range(self.n_blocks):
      residual = x
      for j in range(self.n_stages):
        x = getattr(self, f'{i + 1}_{j + 1}_norm')(x, y)
        x = getattr(self, f'{i + 1}_{j + 1}_conv')(self.act(x))
      x = x + residual
    return x


class CondCRPBlock(nn.Module):
  """Reference layers.py:147-170 (norm -> 5x5 AVG pool -> conv)."""

  def __init__(self, features, num_classes, n_stages=2, act=F.elu):
    super().__init__()
    self.act = act
    self.norms = nn.ModuleList(
        [ConditionalInstanceNorm2dPlus(features, num_classes)
         for _ in range(n_stages)])
    self.convs = nn.ModuleList(
        [conv3x3(features, features, bias=False) for _ in range(n_stages)])

  def forward(self, x, y):
    x = self.act(x)
    path = x
    for norm, conv in zip(self.norms, self.convs):
      path = conv(F.avg_pool2d(norm(path, y), 5, stride=1, padding=2,
                               count_include_pad=True))
      x = path + x
    return x


class CondMSFBlock(nn.Module):
  """Reference layers.py:243-264 (norm before conv, then fuse)."""

  def __init__(self, in_planes, features, num_classes):
    super().__init__()
    self.features = features
    self.norms = nn.ModuleList(
        [ConditionalInstanceNorm2dPlus(c, num_classes) for c in in_planes])
    self.convs = nn.ModuleList(
        [conv3x3(c, features, bias=True) for c in in_planes])

  def forward(self, xs, y, shape):
    total = torch.zeros(xs[0].shape[0], self.features, *shape)
    for norm, conv, x in zip(self.norms, self.convs, xs):
      total = total + F.interpolate(conv(norm(x, y)), size=shape,
                                    mode='bilinear', align_corners=True)
    return total


class CondRefineBlock(nn.Module):
  """Reference layers.py:303-336."""

  def __init__(self, in_planes, features, num_classes, start=False,
               end=False, act=F.elu):
    super().__init__()
    self.n = len(in_planes)
    self.adapt_convs = nn.ModuleList(
        [CondRCUBlock(c, 2, num_classes, act=act) for c in in_planes])
    self.output_convs = CondRCUBlock(features, 3 if end else 1, num_classes,
                                     act=act)
    if not start:
      self.msf = CondMSFBlock(in_planes, features, num_classes)
    self.crp = CondCRPBlock(features, num_classes, act=act)

  def forward(self, xs, y, output_shape):
    hs = [rcu(x, y) for rcu, x in zip(self.adapt_convs, xs)]
    h = self.msf(hs, y, output_shape) if self.n > 1 else hs[0]
    return self.output_convs(self.crp(h, y), y)


class TorchNCSN(nn.Module):
  """Class-conditional NCSN v1 oracle (reference ncsnv2.py:136-218) —
  always the <96px four-stage topology; no sigma division at the end."""

  def __init__(self, config):
    super().__init__()
    nf = config.model.nf
    K = config.model.num_scales
    C = config.data.num_channels
    size = config.data.image_size
    self.centered = config.data.centered
    self.begin_conv = nn.Conv2d(C, nf, 3, padding=1)
    self.normalizer = ConditionalInstanceNorm2dPlus(nf, K)
    self.end_conv = nn.Conv2d(nf, C, 3, padding=1)

    def stage(cin, cout, resample, dil, adj=False):
      return nn.ModuleList([
          ConditionalResidualBlock(cin, cout, K, resample, dil, adj),
          ConditionalResidualBlock(cout, cout, K, None, dil)])

    self.res1 = stage(nf, nf, None, 1)
    self.res2 = stage(nf, 2 * nf, 'down', 1)
    self.res3 = stage(2 * nf, 2 * nf, 'down', 2)
    self.res4 = stage(2 * nf, 2 * nf, 'down', 4, size == 28)
    self.refine1 = CondRefineBlock([2 * nf], 2 * nf, K, start=True)
    self.refine2 = CondRefineBlock([2 * nf, 2 * nf], 2 * nf, K)
    self.refine3 = CondRefineBlock([2 * nf, 2 * nf], nf, K)
    self.refine4 = CondRefineBlock([nf, nf], nf, K, end=True)

  def forward(self, x, y):
    h = x if self.centered else 2 * x - 1.
    out = self.begin_conv(h)
    outs = []
    for name in ('res1', 'res2', 'res3', 'res4'):
      for blk in getattr(self, name):
        out = blk(out, y)
      outs.append(out)
    ref = self.refine1([outs[3]], y, outs[3].shape[2:])
    ref = self.refine2([outs[2], ref], y, outs[2].shape[2:])
    ref = self.refine3([outs[1], ref], y, outs[1].shape[2:])
    ref = self.refine4([outs[0], ref], y, outs[0].shape[2:])
    return self.end_conv(F.elu(self.normalizer(ref, y)))
