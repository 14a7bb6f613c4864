"""Import reference (PyTorch) DDPM checkpoints into this framework.

The reference saves ``{'info', 'optimizer'(s), 'model': state_dict,
'ema': {'decay', 'num_updates', 'shadow_params'}, 'step'}``
(reference utils.py:109-128).  Its 'ddpm' model is a flat ``nn.ModuleList``
walked with a manual index (reference models/ddpm.py:39-183), so model keys
look like ``all_modules.{i}.GroupNorm_0.weight``.  This module replays that
module-order walk against our flax auto-naming to build the equivalent
``params`` pytree:

* Conv2d OIHW kernels -> flax HWIO (``transpose(2, 3, 1, 0)``);
* Linear ``(out, in)`` weights -> flax Dense ``(in, out)`` kernels;
* GroupNorm ``weight``/``bias`` -> flax ``scale``/``bias``;
* NIN ``W``/``b`` pass through (both sides store ``(in, out)``);
* the ``sigmas`` buffer is dropped (recomputed from config here).

EMA shadow params are a flat tensor list in ``model.parameters()`` order
(reference models/ema.py:29-30, :94-96), which for this model equals the
state-dict key order minus the ``sigmas`` buffer — so EMA conversion is a
key-ordered substitution followed by the same walk.

Optimizer state is NOT converted: torch Adam moments are layout-coupled
(OIHW vs HWIO) and schedule-coupled; an imported run restarts optimization
from the imported weights.

NHWC note: weights convert exactly; activations stay NHWC here, so feed
NHWC inputs (transpose any NCHW arrays once at the boundary).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np


def _np(t) -> np.ndarray:
  """torch.Tensor | np.ndarray -> float32 numpy (no torch import needed)."""
  if hasattr(t, 'detach'):
    t = t.detach().cpu().numpy()
  return np.asarray(t, dtype=np.float32)


def strip_module_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
  """Drop the ``module.`` prefix torch.nn.DataParallel adds to every key.

  The reference wraps every score model in DataParallel at creation
  (reference models/utils.py:93) and saves ``state['model'].state_dict()``
  (utils.py:116), so real checkpoints carry ``module.all_modules.0.weight``
  etc.  Unwrapped state_dicts pass through unchanged."""
  if state_dict and all(k.startswith('module.') for k in state_dict):
    return {k[len('module.'):]: v for k, v in state_dict.items()}
  return dict(state_dict)


def _conv(sd: Dict[str, Any], prefix: str, used: set) -> Dict[str, np.ndarray]:
  used.add(prefix + '.weight')
  out = {'kernel': _np(sd[prefix + '.weight']).transpose(2, 3, 1, 0)}
  if prefix + '.bias' in sd:
    used.add(prefix + '.bias')
    out['bias'] = _np(sd[prefix + '.bias'])
  return out


def _linear(sd, prefix, used):
  used.update((prefix + '.weight', prefix + '.bias'))
  return {'kernel': _np(sd[prefix + '.weight']).T,
          'bias': _np(sd[prefix + '.bias'])}


def _groupnorm(sd, prefix, used):
  used.update((prefix + '.weight', prefix + '.bias'))
  return {'scale': _np(sd[prefix + '.weight']),
          'bias': _np(sd[prefix + '.bias'])}


def _nin(sd, prefix, used):
  used.update((prefix + '.W', prefix + '.b'))
  return {'W': _np(sd[prefix + '.W']), 'b': _np(sd[prefix + '.b'])}


def _ddpm_walk(config) -> List[Tuple[int, str, str, dict]]:
  """Replay the reference's ``all_modules`` construction order
  (reference models/ddpm.py:58-106) and our flax creation order
  (models/ddpm.py ``__call__``) — they are the same sequence, so one walk
  yields ``(torch_index, kind, flax_name, extra)`` for every module.
  """
  nf = config.model.nf
  ch_mult = config.model.ch_mult
  num_res_blocks = config.model.num_res_blocks
  attn_resolutions = config.model.attn_resolutions
  resamp_with_conv = config.model.resamp_with_conv
  num_resolutions = len(ch_mult)
  all_res = [config.data.image_size // (2 ** i) for i in range(num_resolutions)]

  if not config.model.conditional:
    # The reference DDPM only constructs its module list under
    # conditional=True (models/ddpm.py:58-65 — `modules` is undefined
    # otherwise), so unconditional torch checkpoints cannot exist.
    raise ValueError('reference DDPM checkpoints are always conditional')

  entries: List[Tuple[int, str, str, dict]] = []
  counters: Dict[str, int] = {}
  idx = 0

  def emit(kind: str, flax_type: str, **extra):
    nonlocal idx
    n = counters.get(flax_type, 0)
    counters[flax_type] = n + 1
    entries.append((idx, kind, f'{flax_type}_{n}', extra))
    idx += 1

  emit('linear', 'Dense')
  emit('linear', 'Dense')
  emit('conv', 'Conv3x3')

  hs_c = [nf]
  in_ch = nf
  for i_level in range(num_resolutions):
    for _ in range(num_res_blocks):
      out_ch = nf * ch_mult[i_level]
      emit('resblock', 'ResnetBlockDDPM', in_ch=in_ch, out_ch=out_ch)
      in_ch = out_ch
      if all_res[i_level] in attn_resolutions:
        emit('attn', 'AttnBlock')
      hs_c.append(in_ch)
    if i_level != num_resolutions - 1:
      emit('downsample', 'Downsample', with_conv=resamp_with_conv)
      hs_c.append(in_ch)

  emit('resblock', 'ResnetBlockDDPM', in_ch=in_ch, out_ch=in_ch)
  emit('attn', 'AttnBlock')
  emit('resblock', 'ResnetBlockDDPM', in_ch=in_ch, out_ch=in_ch)

  for i_level in reversed(range(num_resolutions)):
    for _ in range(num_res_blocks + 1):
      out_ch = nf * ch_mult[i_level]
      emit('resblock', 'ResnetBlockDDPM',
           in_ch=in_ch + hs_c.pop(), out_ch=out_ch)
      in_ch = out_ch
    if all_res[i_level] in attn_resolutions:
      emit('attn', 'AttnBlock')
    if i_level != 0:
      emit('upsample', 'Upsample', with_conv=resamp_with_conv)

  assert not hs_c
  emit('groupnorm', 'GroupNorm')
  emit('conv', 'Conv3x3')
  return entries


def ddpm_params_from_torch_state_dict(state_dict: Dict[str, Any],
                                      config) -> Dict[str, Any]:
  """Reference 'ddpm' model state_dict -> flax ``params`` pytree.

  Raises ``ValueError`` if any ``all_modules.*`` key is left unconsumed —
  a shape/architecture mismatch between the checkpoint and ``config``
  surfaces as a KeyError/transpose error instead of silent garbage.
  """
  state_dict = strip_module_prefix(state_dict)
  used: set = set()
  params: Dict[str, Any] = {}

  for torch_idx, kind, flax_name, extra in _ddpm_walk(config):
    p = f'all_modules.{torch_idx}'
    if kind == 'linear':
      params[flax_name] = _linear(state_dict, p, used)
    elif kind == 'conv':
      params[flax_name] = {'Conv_0': _conv(state_dict, p, used)}
    elif kind == 'groupnorm':
      params[flax_name] = _groupnorm(state_dict, p, used)
    elif kind == 'attn':
      params[flax_name] = {
          'GroupNorm_0': _groupnorm(state_dict, p + '.GroupNorm_0', used),
          'NIN_0': _nin(state_dict, p + '.NIN_0', used),
          'NIN_1': _nin(state_dict, p + '.NIN_1', used),
          'NIN_2': _nin(state_dict, p + '.NIN_2', used),
          'NIN_3': _nin(state_dict, p + '.NIN_3', used),
      }
    elif kind == 'downsample':
      if extra['with_conv']:
        params[flax_name] = {'Conv_0': _conv(state_dict, p + '.Conv_0', used)}
    elif kind == 'upsample':
      if extra['with_conv']:
        params[flax_name] = {
            'Conv3x3_0': {'Conv_0': _conv(state_dict, p + '.Conv_0', used)}}
    elif kind == 'resblock':
      block = {
          'GroupNorm_0': _groupnorm(state_dict, p + '.GroupNorm_0', used),
          'Conv3x3_0': {'Conv_0': _conv(state_dict, p + '.Conv_0', used)},
          'Dense_0': _linear(state_dict, p + '.Dense_0', used),
          'GroupNorm_1': _groupnorm(state_dict, p + '.GroupNorm_1', used),
          'Conv3x3_1': {'Conv_0': _conv(state_dict, p + '.Conv_1', used)},
      }
      if extra['in_ch'] != extra['out_ch']:
        if p + '.NIN_0.W' in state_dict:
          block['NIN_0'] = _nin(state_dict, p + '.NIN_0', used)
        else:  # conv_shortcut variant (reference layers.py:633-636)
          block['Conv3x3_2'] = {'Conv_0': _conv(state_dict, p + '.Conv_2',
                                                used)}
      params[flax_name] = block
    else:  # pragma: no cover - walk only emits the kinds above
      raise AssertionError(kind)

  unconsumed = sorted(k for k in state_dict
                      if k.startswith('all_modules.') and k not in used)
  if unconsumed:
    raise ValueError(
        'torch state_dict keys not consumed by the architecture walk '
        f'(checkpoint/config mismatch?): {unconsumed[:8]}'
        f'{" ..." if len(unconsumed) > 8 else ""}')
  return params


def _fir_conv2d(sd, prefix, used):
  """up_or_down_sampling.Conv2d (reference up_or_down_sampling.py:23-56):
  torch ``weight`` (O, I, kH, kW) -> our resample.Conv2d ``weight`` HWIO."""
  used.add(prefix + '.weight')
  out = {'weight': _np(sd[prefix + '.weight']).transpose(2, 3, 1, 0)}
  if prefix + '.bias' in sd:
    used.add(prefix + '.bias')
    out['bias'] = _np(sd[prefix + '.bias'])
  return out


def _ncsnpp_walk(config) -> List[Tuple[Optional[int], str, str, dict]]:
  """Replay the reference NCSN++ ``all_modules`` construction order
  (reference models/ncsnpp.py:68-230) against our flax auto-naming
  (models/ncsnpp.py ``__call__``) — the module sequences are identical, so
  one walk yields ``(torch_index, kind, flax_name, extra)`` per module.

  Two bookkeeping subtleties the DDPM walk does not have:

  * the progressive pyramid resamplers with ``with_conv=False`` live
    OUTSIDE ``all_modules`` on the torch side (``self.pyramid_upsample`` /
    ``self.pyramid_downsample``, reference ncsnpp.py:101,110) but are
    ordinary auto-named flax submodules on ours — they consume a flax name
    counter while owning no params and no torch index (kind='skip');
  * ``nf * 4`` temb Denses exist only under ``conditional``, and the
    fourier projection only under ``embedding_type='fourier'``.
  """
  nf = config.model.nf
  ch_mult = config.model.ch_mult
  num_res_blocks = config.model.num_res_blocks
  attn_resolutions = config.model.attn_resolutions
  resamp_with_conv = config.model.resamp_with_conv
  num_resolutions = len(ch_mult)
  all_res = [config.data.image_size // (2 ** i) for i in range(num_resolutions)]
  resblock_type = config.model.resblock_type.lower()
  progressive = config.model.progressive.lower()
  progressive_input = config.model.progressive_input.lower()
  embedding_type = config.model.embedding_type.lower()
  combine_method = config.model.progressive_combine.lower()
  fir = config.model.fir
  resblock_cls = ('ResnetBlockBigGANpp' if resblock_type == 'biggan'
                  else 'ResnetBlockDDPMpp')

  entries: List[Tuple[Optional[int], str, str, dict]] = []
  counters: Dict[str, int] = {}
  idx = 0

  def flax_name(flax_type: str) -> str:
    n = counters.get(flax_type, 0)
    counters[flax_type] = n + 1
    return f'{flax_type}_{n}'

  def emit(kind: str, flax_type: str, **extra):
    nonlocal idx
    entries.append((idx, kind, flax_name(flax_type), extra))
    idx += 1

  def resblock(in_ch, out_ch, up=False, down=False):
    if resblock_type == 'biggan':
      shortcut = 'conv1x1' if (in_ch != out_ch or up or down) else None
    else:
      shortcut = 'nin' if in_ch != out_ch else None
    emit('resblock', resblock_cls, shortcut=shortcut,
         conditional=config.model.conditional)

  if embedding_type == 'fourier':
    emit('fourier', 'GaussianFourierProjection')
  if config.model.conditional:
    emit('linear', 'Dense')
    emit('linear', 'Dense')

  emit('conv3x3', 'Conv3x3')
  hs_c = [nf]
  in_ch = nf
  input_pyramid_ch = config.data.num_channels

  for i_level in range(num_resolutions):
    for _ in range(num_res_blocks):
      out_ch = nf * ch_mult[i_level]
      resblock(in_ch, out_ch)
      in_ch = out_ch
      if all_res[i_level] in attn_resolutions:
        emit('attn', 'AttnBlockpp')
      hs_c.append(in_ch)
    if i_level != num_resolutions - 1:
      if resblock_type == 'ddpm':
        emit('downsample', 'Downsample', with_conv=resamp_with_conv, fir=fir)
      else:
        resblock(in_ch, in_ch, down=True)
      if progressive_input == 'input_skip':
        flax_name('Downsample')        # param-less pyramid_downsample (flax)
        emit('combine', 'Combine')
        if combine_method == 'cat':
          in_ch *= 2
      elif progressive_input == 'residual':
        emit('downsample', 'Downsample', with_conv=True, fir=fir)
        input_pyramid_ch = in_ch
      hs_c.append(in_ch)

  resblock(in_ch, in_ch)
  emit('attn', 'AttnBlockpp')
  resblock(in_ch, in_ch)

  pyramid_ch = 0
  for i_level in reversed(range(num_resolutions)):
    for _ in range(num_res_blocks + 1):
      out_ch = nf * ch_mult[i_level]
      resblock(in_ch + hs_c.pop(), out_ch)
      in_ch = out_ch
    if all_res[i_level] in attn_resolutions:
      emit('attn', 'AttnBlockpp')
    if progressive != 'none':
      if i_level == num_resolutions - 1:
        emit('groupnorm', 'GroupNorm')
        emit('conv3x3', 'Conv3x3')
        pyramid_ch = (config.data.num_channels
                      if progressive == 'output_skip' else in_ch)
      else:
        if progressive == 'output_skip':
          flax_name('Upsample')        # param-less pyramid_upsample (flax)
          emit('groupnorm', 'GroupNorm')
          emit('conv3x3', 'Conv3x3')
        else:  # 'residual'
          emit('upsample', 'Upsample', with_conv=True, fir=fir)
          pyramid_ch = in_ch
    if i_level != 0:
      if resblock_type == 'ddpm':
        emit('upsample', 'Upsample', with_conv=resamp_with_conv, fir=fir)
      else:
        resblock(in_ch, in_ch, up=True)

  assert not hs_c
  if progressive != 'output_skip':
    emit('groupnorm', 'GroupNorm')
    emit('conv3x3', 'Conv3x3')
  del pyramid_ch, input_pyramid_ch  # tracked only to mirror the reference
  return entries


def ncsnpp_params_from_torch_state_dict(state_dict: Dict[str, Any],
                                        config) -> Dict[str, Any]:
  """Reference 'ncsnpp' model state_dict -> flax ``params`` pytree
  (reference models/ncsnpp.py:34-381 — the published flagship family).

  Covers every architecture axis the reference constructor switches on:
  ddpm/biggan resblocks, fourier/positional embeddings, FIR or naive
  resampling, and all progressive / progressive_input pyramid variants.
  Raises ``ValueError`` on unconsumed ``all_modules.*`` keys, like the
  DDPM converter.
  """
  state_dict = strip_module_prefix(state_dict)
  used: set = set()
  params: Dict[str, Any] = {}
  fir = config.model.fir

  def conv_module(p):
    # flax Conv3x3/Conv1x1 wrap an inner nn.Conv scoped 'Conv_0'.
    return {'Conv_0': _conv(state_dict, p, used)}

  for torch_idx, kind, name, extra in _ncsnpp_walk(config):
    p = f'all_modules.{torch_idx}'
    if kind == 'skip':  # pragma: no cover - param-less entries are not emitted
      continue
    if kind == 'fourier':
      used.add(p + '.W')
      params[name] = {'W': _np(state_dict[p + '.W'])}
    elif kind == 'linear':
      params[name] = _linear(state_dict, p, used)
    elif kind == 'conv3x3':
      params[name] = conv_module(p)
    elif kind == 'groupnorm':
      params[name] = _groupnorm(state_dict, p, used)
    elif kind == 'attn':
      params[name] = {
          'GroupNorm_0': _groupnorm(state_dict, p + '.GroupNorm_0', used),
          'NIN_0': _nin(state_dict, p + '.NIN_0', used),
          'NIN_1': _nin(state_dict, p + '.NIN_1', used),
          'NIN_2': _nin(state_dict, p + '.NIN_2', used),
          'NIN_3': _nin(state_dict, p + '.NIN_3', used),
      }
    elif kind == 'combine':
      params[name] = {'Conv1x1_0': conv_module(p + '.Conv_0')}
    elif kind == 'downsample':
      if not extra['with_conv']:
        continue
      if fir:
        params[name] = {'Conv2d_0': _fir_conv2d(state_dict, p + '.Conv2d_0',
                                                used)}
      else:
        params[name] = {'Conv_0': _conv(state_dict, p + '.Conv_0', used)}
    elif kind == 'upsample':
      if not extra['with_conv']:
        continue
      if fir:
        params[name] = {'Conv2d_0': _fir_conv2d(state_dict, p + '.Conv2d_0',
                                                used)}
      else:
        params[name] = {'Conv3x3_0': conv_module(p + '.Conv_0')}
    elif kind == 'resblock':
      block = {
          'GroupNorm_0': _groupnorm(state_dict, p + '.GroupNorm_0', used),
          'Conv3x3_0': conv_module(p + '.Conv_0'),
          'GroupNorm_1': _groupnorm(state_dict, p + '.GroupNorm_1', used),
          'Conv3x3_1': conv_module(p + '.Conv_1'),
      }
      if extra['conditional']:
        block['Dense_0'] = _linear(state_dict, p + '.Dense_0', used)
      if extra['shortcut'] == 'conv1x1':   # biggan (reference layerspp.py:235)
        block['Conv1x1_0'] = conv_module(p + '.Conv_2')
      elif extra['shortcut'] == 'nin':     # ddpm++ (reference layerspp.py:186)
        block['NIN_0'] = _nin(state_dict, p + '.NIN_0', used)
      params[name] = block
    else:  # pragma: no cover - walk only emits the kinds above
      raise AssertionError(kind)

  unconsumed = sorted(k for k in state_dict
                      if k.startswith('all_modules.') and k not in used)
  if unconsumed:
    raise ValueError(
        'torch state_dict keys not consumed by the NCSN++ architecture walk '
        f'(checkpoint/config mismatch?): {unconsumed[:8]}'
        f'{" ..." if len(unconsumed) > 8 else ""}')
  return params


def _in_plus(sd, prefix, used):
  """InstanceNorm2dPlus params (reference normalization.py:157-168):
  alpha/gamma/beta carry the same names on both sides."""
  out = {'alpha': _np(sd[prefix + '.alpha']),
         'gamma': _np(sd[prefix + '.gamma'])}
  used.update((prefix + '.alpha', prefix + '.gamma'))
  if prefix + '.beta' in sd:
    used.add(prefix + '.beta')
    out['beta'] = _np(sd[prefix + '.beta'])
  return out


def _ncsnv2_residual_block(sd, p, used, resample, dilation, in_eq_out,
                           adjust_padding=False):
  """Reference models/layers.py:438-492 ResidualBlock -> our
  layers_ncsn.ResidualBlock flax scope.

  torch attributes: conv1 / conv2 / shortcut / normalize1 / normalize2;
  flax auto-names follow CALL order (normalize1, conv1, normalize2, conv2,
  shortcut).  ConvMeanPool nests its conv under ``.conv`` — or ``.conv.1``
  when adjust_padding wraps it in Sequential(ZeroPad2d, conv) (reference
  layers.py:339-349).  The ``.conv.1`` branch is defensive-only: no real
  reference checkpoint reaches it — every ctor that passes
  adjust_padding=True (the 28px res4) also passes dilation=4, and the
  block only consults adjust_padding when dilation==1 (layers.py:448-457).
  """
  blk = {'InstanceNorm2dPlus_0': _in_plus(sd, p + '.normalize1', used),
         'InstanceNorm2dPlus_1': _in_plus(sd, p + '.normalize2', used)}

  def ncsn_conv(prefix):
    return {'Conv_0': _conv(sd, prefix, used)}

  if resample == 'down':
    blk['NCSNConv_0'] = ncsn_conv(p + '.conv1')
    if dilation > 1:
      blk['NCSNConv_1'] = ncsn_conv(p + '.conv2')
      blk['NCSNConv_2'] = ncsn_conv(p + '.shortcut')
    else:
      cm = '.conv.1' if adjust_padding else '.conv'
      blk['ConvMeanPool_0'] = {'NCSNConv_0': ncsn_conv(p + '.conv2' + cm)}
      blk['ConvMeanPool_1'] = {'NCSNConv_0': ncsn_conv(p + '.shortcut' + cm)}
  else:  # resample is None
    blk['NCSNConv_0'] = ncsn_conv(p + '.conv1')
    blk['NCSNConv_1'] = ncsn_conv(p + '.conv2')
    if not in_eq_out:  # 1x1 (or dilated 3x3) shortcut, plain 'shortcut' key
      blk['NCSNConv_2'] = ncsn_conv(p + '.shortcut')
  return blk


def _ncsnv2_rcu(sd, p, used, n_blocks, n_stages=2):
  """RCUBlock: torch setattr names ``{i+1}_{j+1}_conv`` (reference
  layers.py:173-186), flax NCSNConv_{k} in the same (block, stage) order."""
  out, k = {}, 0
  for i in range(n_blocks):
    for j in range(n_stages):
      out[f'NCSNConv_{k}'] = {
          'Conv_0': _conv(sd, f'{p}.{i + 1}_{j + 1}_conv', used)}
      k += 1
  return out


def _ncsnv2_convlist(sd, p, used, n):
  """CRP/MSF blocks: torch ModuleList ``convs.{i}`` -> flax NCSNConv_{i}."""
  return {f'NCSNConv_{i}': {'Conv_0': _conv(sd, f'{p}.convs.{i}', used)}
          for i in range(n)}


def _ncsnv2_refine_block(sd, p, used, n_inputs, end):
  """RefineBlock (reference layers.py:267-300): adapt_convs RCUs, MSF (only
  for n_inputs>1), CRP, output RCU — flax creation order RCUBlock_0..n-1,
  MSFBlock_0, CRPBlock_0, RCUBlock_n."""
  blk = {}
  for i in range(n_inputs):
    blk[f'RCUBlock_{i}'] = _ncsnv2_rcu(sd, f'{p}.adapt_convs.{i}', used, 2)
  if n_inputs > 1:
    blk['MSFBlock_0'] = _ncsnv2_convlist(sd, f'{p}.msf', used, n_inputs)
  blk['CRPBlock_0'] = _ncsnv2_convlist(sd, f'{p}.crp', used, 2)
  blk[f'RCUBlock_{n_inputs}'] = _ncsnv2_rcu(sd, f'{p}.output_convs', used,
                                            3 if end else 1)
  return blk


def _ncsnv2_layout(config, force_small: bool = False):
  """(res_blocks, refines) for the size-dispatched NCSNv2 variant.
  ``force_small`` pins the <96px topology (the class-conditional NCSN v1
  uses it at any size, reference ncsnv2.py:136-199).

  res_blocks: ``(torch_prefix, resample, dilation, in_eq_out, adjust)`` in
  flax creation order; refines: ``(torch_attr, n_inputs, end)``.  Mirrors
  the reference constructors (models/ncsnv2.py:44-99 for <96px, :221-277
  for 128px, :315-379 for 256px) — note the 256 variant's refine31 sits
  between refine2 and refine3 in FORWARD order (ncsnv2.py:401-406), which
  is what flax auto-naming follows.
  """
  size = config.data.image_size
  if force_small and size >= 96:
    size = 32   # keep the real size below 96 so the ==28 adjust check holds
  pair = lambda name, resample=None, dil=1, eq=True, adj=False: [
      (f'{name}.0', resample, dil, eq, adj), (f'{name}.1', None, dil, True,
                                              False)]
  if size < 96:
    res = (pair('res1') + pair('res2', 'down', eq=False)
           + pair('res3', 'down', dil=2)
           + pair('res4', 'down', dil=4, adj=(size == 28)))
    refines = [('refine1', 1, False), ('refine2', 2, False),
               ('refine3', 2, False), ('refine4', 2, True)]
  elif size <= 128:
    res = (pair('res1') + pair('res2', 'down', eq=False)
           + pair('res3', 'down') + pair('res4', 'down', dil=2, eq=False)
           + pair('res5', 'down', dil=4))
    refines = [('refine1', 1, False), ('refine2', 2, False),
               ('refine3', 2, False), ('refine4', 2, False),
               ('refine5', 2, True)]
  else:
    res = (pair('res1') + pair('res2', 'down', eq=False)
           + pair('res3', 'down') + pair('res31', 'down')
           + pair('res4', 'down', dil=2, eq=False)
           + pair('res5', 'down', dil=4))
    refines = [('refine1', 1, False), ('refine2', 2, False),
               ('refine31', 2, False), ('refine3', 2, False),
               ('refine4', 2, False), ('refine5', 2, True)]
  return res, refines


def ncsnv2_params_from_torch_state_dict(state_dict: Dict[str, Any],
                                        config) -> Dict[str, Any]:
  """Reference NCSNv2 state_dict -> flax ``params`` pytree
  (reference models/ncsnv2.py — the attribute-named RefineNet family;
  size-dispatched like models/ncsnv2.py:31-40 ``get_network``).

  Unlike DDPM/NCSN++ there is no ``all_modules`` index walk: torch keys are
  attribute paths (``res2.0.conv1.weight``, ``refine3.crp.convs.1.weight``)
  mapped onto our flax auto-naming, which follows the reference's forward
  order.  Raises ``ValueError`` on unconsumed model keys like the other
  converters.
  """
  state_dict = strip_module_prefix(state_dict)
  used: set = set()
  params: Dict[str, Any] = {
      'NCSNConv_0': {'Conv_0': _conv(state_dict, 'begin_conv', used)}}

  res_blocks, refines = _ncsnv2_layout(config)
  for i, (tp, resample, dil, eq, adj) in enumerate(res_blocks):
    params[f'ResidualBlock_{i}'] = _ncsnv2_residual_block(
        state_dict, tp, used, resample, dil, eq, adj)
  for j, (tp, n_inputs, end) in enumerate(refines):
    params[f'RefineBlock_{j}'] = _ncsnv2_refine_block(state_dict, tp, used,
                                                      n_inputs, end)
  params['InstanceNorm2dPlus_0'] = _in_plus(state_dict, 'normalizer', used)
  params['NCSNConv_1'] = {'Conv_0': _conv(state_dict, 'end_conv', used)}

  unconsumed = sorted(k for k in state_dict
                      if k != 'sigmas' and k not in used)
  if unconsumed:
    raise ValueError(
        'torch state_dict keys not consumed by the NCSNv2 layout '
        f'(checkpoint/config mismatch?): {unconsumed[:8]}'
        f'{" ..." if len(unconsumed) > 8 else ""}')
  return params


def _cond_in_plus(sd, prefix, used):
  """ConditionalInstanceNorm2dPlus (reference normalization.py:186-215):
  one nn.Embedding 'embed.weight' (num_classes, 3C) -> flax
  {'Embed_0': {'embedding'}} with the same [gamma, alpha, beta] chunking."""
  used.add(prefix + '.embed.weight')
  return {'Embed_0': {'embedding': _np(sd[prefix + '.embed.weight'])}}


def _ncsn_cond_residual_block(sd, p, used, resample, dilation,
                              adjust_padding=False):
  """ConditionalResidualBlock (reference layers.py:382-435) -> flax
  layers_ncsn.ConditionalResidualBlock scope.  Same conv topology as the
  unconditional block; the norms are embeddings.  (The reference's own
  class cannot be constructed — ``dilation=None`` defaults make every
  ``dilation > 1`` comparison a TypeError and the dilated convs carry the
  padding=1 bug — see tests/torch_ncsnv2_oracle.py; keys are unaffected.)"""
  blk = {'ConditionalInstanceNorm2dPlus_0':
             _cond_in_plus(sd, p + '.normalize1', used),
         'ConditionalInstanceNorm2dPlus_1':
             _cond_in_plus(sd, p + '.normalize2', used)}

  def ncsn_conv(prefix):
    return {'Conv_0': _conv(sd, prefix, used)}

  if resample == 'down':
    blk['NCSNConv_0'] = ncsn_conv(p + '.conv1')
    if dilation > 1:
      blk['NCSNConv_1'] = ncsn_conv(p + '.conv2')
      blk['NCSNConv_2'] = ncsn_conv(p + '.shortcut')
    else:
      cm = '.conv.1' if adjust_padding else '.conv'
      blk['ConvMeanPool_0'] = {'NCSNConv_0': ncsn_conv(p + '.conv2' + cm)}
      blk['ConvMeanPool_1'] = {'NCSNConv_0': ncsn_conv(p + '.shortcut' + cm)}
  else:
    blk['NCSNConv_0'] = ncsn_conv(p + '.conv1')
    blk['NCSNConv_1'] = ncsn_conv(p + '.conv2')
    if p + '.shortcut.weight' in sd:   # only when dims differ (dilated 3x3)
      blk['NCSNConv_2'] = ncsn_conv(p + '.shortcut')
  return blk


def _ncsn_cond_rcu(sd, p, used, n_blocks, n_stages=2):
  """CondRCUBlock (reference layers.py:197-221): setattr pairs
  '{i}_{j}_norm' / '{i}_{j}_conv'; flax interleaves the same order."""
  out, k = {}, 0
  for i in range(n_blocks):
    for j in range(n_stages):
      out[f'ConditionalInstanceNorm2dPlus_{k}'] = _cond_in_plus(
          sd, f'{p}.{i + 1}_{j + 1}_norm', used)
      out[f'NCSNConv_{k}'] = {
          'Conv_0': _conv(sd, f'{p}.{i + 1}_{j + 1}_conv', used)}
      k += 1
  return out


def _ncsn_cond_convlist(sd, p, used, n):
  """CondCRP/CondMSF (reference layers.py:147-170, :243-264): paired
  ModuleLists 'norms.{i}' / 'convs.{i}'."""
  out = {}
  for i in range(n):
    out[f'ConditionalInstanceNorm2dPlus_{i}'] = _cond_in_plus(
        sd, f'{p}.norms.{i}', used)
    out[f'NCSNConv_{i}'] = {'Conv_0': _conv(sd, f'{p}.convs.{i}', used)}
  return out


def _ncsn_cond_refine_block(sd, p, used, n_inputs, end):
  """CondRefineBlock (reference layers.py:303-336)."""
  blk = {}
  for i in range(n_inputs):
    blk[f'CondRCUBlock_{i}'] = _ncsn_cond_rcu(sd, f'{p}.adapt_convs.{i}',
                                              used, 2)
  if n_inputs > 1:
    blk['CondMSFBlock_0'] = _ncsn_cond_convlist(sd, f'{p}.msf', used,
                                                n_inputs)
  blk['CondCRPBlock_0'] = _ncsn_cond_convlist(sd, f'{p}.crp', used, 2)
  blk[f'CondRCUBlock_{n_inputs}'] = _ncsn_cond_rcu(
      sd, f'{p}.output_convs', used, 3 if end else 1)
  return blk


def ncsn_params_from_torch_state_dict(state_dict: Dict[str, Any],
                                      config) -> Dict[str, Any]:
  """Reference class-conditional NCSN (v1) state_dict -> flax params
  (reference models/ncsnv2.py:136-218 — same stage/refine topology as the
  <96px NCSNv2, with conditional blocks and embedding norms)."""
  state_dict = strip_module_prefix(state_dict)
  used: set = set()
  params: Dict[str, Any] = {
      'NCSNConv_0': {'Conv_0': _conv(state_dict, 'begin_conv', used)}}

  res_blocks, refines = _ncsnv2_layout(config, force_small=True)
  for i, (tp, resample, dil, _eq, adj) in enumerate(res_blocks):
    params[f'ConditionalResidualBlock_{i}'] = _ncsn_cond_residual_block(
        state_dict, tp, used, resample, dil, adj)
  for j, (tp, n_inputs, end) in enumerate(refines):
    params[f'CondRefineBlock_{j}'] = _ncsn_cond_refine_block(
        state_dict, tp, used, n_inputs, end)
  params['ConditionalInstanceNorm2dPlus_0'] = _cond_in_plus(
      state_dict, 'normalizer', used)
  params['NCSNConv_1'] = {'Conv_0': _conv(state_dict, 'end_conv', used)}

  unconsumed = sorted(k for k in state_dict
                      if k != 'sigmas' and k not in used)
  if unconsumed:
    raise ValueError(
        'torch state_dict keys not consumed by the NCSN layout '
        f'(checkpoint/config mismatch?): {unconsumed[:8]}'
        f'{" ..." if len(unconsumed) > 8 else ""}')
  return params


def _seq_convs(sd, p, used, flax_names, torch_idx):
  """A reference Sequential conv stack (conv, LeakyReLU, conv, ...) ->
  flax Conv_{i} entries (get_conv_feature/field/up_layer builders,
  reference models/flownet.py:27-58)."""
  return {fn: _conv(sd, f'{p}.{ti}', used)
          for fn, ti in zip(flax_names, torch_idx)}


def _plain_double_res(sd, p, used, cin, cout):
  """get_double_res (reference flownet.py:219-224): two ResidualBlocks with
  param-free InstanceNorm2d — torch keys conv1/conv2/shortcut only; flax
  scope DoubleRes -> ResidualBlock_{0,1} -> NCSNConv_{0,1,2}."""

  def res(pp, rin, rout):
    blk = {'NCSNConv_0': {'Conv_0': _conv(sd, pp + '.conv1', used)},
           'NCSNConv_1': {'Conv_0': _conv(sd, pp + '.conv2', used)}}
    if rin != rout:
      blk['NCSNConv_2'] = {'Conv_0': _conv(sd, pp + '.shortcut', used)}
    return blk

  return {'ResidualBlock_0': res(p + '.0', cin, 2 * cin),
          'ResidualBlock_1': res(p + '.1', 2 * cin, cout)}


def _flow_upsample(sd, prefix, used):
  """Matching.flow_upsample: torch ConvTranspose2d(2, 2, 4, stride=2,
  padding=1, groups=2, bias=False), weight (in=2, out/g=1, 4, 4) -> our
  FlowUpsample lhs-dilated conv 'weight' (4, 4, 1, 2).

  A stride-2/pad-1 transposed conv equals a 2x-lhs-dilated correlation with
  the SPATIALLY FLIPPED kernel and padding k-1-p = 2 (which is what
  models/flownet.FlowUpsample computes), so the kernel flips here; groups
  map input channel g straight to output channel g on both sides."""
  used.add(prefix + '.weight')
  w = _np(sd[prefix + '.weight'])[:, 0, ::-1, ::-1]   # (2, 4, 4), flipped
  return {'weight': np.ascontiguousarray(w.transpose(1, 2, 0))[:, :, None, :]}


def _conv_transpose(sd, prefix, used):
  """PressureNet up: torch ConvTranspose2d(ch_i, ch_o, 2, stride=2) weight
  (I, O, kh, kw) -> flax nn.ConvTranspose kernel HWIO, SPATIALLY FLIPPED:
  torch's transposed conv scatters w[.., kh, kw] to output offset (kh, kw),
  while flax ConvTranspose gathers with the kernel unflipped — verified
  numerically (unflipped: max diff ~1.06; flipped: exact)."""
  used.update((prefix + '.weight', prefix + '.bias'))
  w = _np(sd[prefix + '.weight']).transpose(2, 3, 0, 1)
  return {'kernel': np.ascontiguousarray(w[::-1, ::-1]),
          'bias': _np(sd[prefix + '.bias'])}


_FIELD = (('Conv_0', 0), ('Conv_1', 2), ('Conv_2', 4), ('Conv_3', 6))


def pinn_params_from_torch_state_dict(state_dict: Dict[str, Any],
                                      config) -> Dict[str, Any]:
  """Reference PINN (pinn_kalman/pinn.py:34-114: FlowNet + PressureNet)
  state_dict -> flax ``params`` pytree {'flownet', 'pressurenet'}.

  Only the 'flownet' pyramid architecture converts (the reference PINN
  configs' default); a LiteFlowNet-based PINN raises.  The coarsest
  Matching unit's ``flow_upsample`` exists on the torch side but is never
  called (reference flownet.py:98-105 constructs it unconditionally,
  :112-117 skips it when flow is None), so its parameters are consumed and
  dropped — our flax Matching only creates the module when it is used.
  """
  if getattr(config.model, 'arch', 'flownet') != 'flownet':
    # The PINN flownet is selected by config.model.arch (reference
    # pinn_kalman/pinn.py:20-30).  Only the pyramid FlowNet converts; note
    # the reference's own liteflownet-PINN path cannot produce checkpoints
    # anyway — LiteFlowNet.forward takes (f1, f2, coord, t) while PINN
    # calls flownet(f1, f2, x, y, t, size=...) (models/liteflownet.py
    # docstring documents the signature mismatch).
    raise ValueError(
        f"PINN converter supports arch='flownet' only, got "
        f"'{config.model.arch}'")
  sd = strip_module_prefix(state_dict)
  used: set = set()
  L = len(config.model.feature_nums)

  # ---- flownet ----
  fe = {}
  for i in range(L):
    fe[f'ConvFeature_{i}'] = _seq_convs(
        sd, f'flownet.feature_extractor.feature_extractors.{i}', used,
        ('Conv_0', 'Conv_1'), (0, 2))
  flownet: Dict[str, Any] = {'FeatureExtractor_0': fe}
  for j in range(L):
    p = f'flownet.inference_units.{j}'
    matching = {'ConvField_0': _seq_convs(sd, p + '.match.corr_conv', used,
                                          *zip(*_FIELD))}
    if j == 0:
      # constructed-but-unused coarsest flow_upsample: consume and drop.
      used.add(p + '.match.flow_upsample.weight')
    else:
      matching['FlowUpsample_0'] = _flow_upsample(
          sd, p + '.match.flow_upsample', used)
    flownet[f'InferenceUnit_{j}'] = {
        'Matching_0': matching,
        'SubpixelRefinement_0': {
            'ConvField_0': _seq_convs(sd, p + '.refinement.flow_conv', used,
                                      *zip(*_FIELD))},
    }
  flownet['FinalUpsample_0'] = {'ConvUp_0': _seq_convs(
      sd, 'flownet.upsample.up', used,
      ('Conv_0', 'Conv_1', 'Conv_2'), (0, 2, 4))}

  # ---- pressurenet ----
  ch = list(config.model.feature_nums)
  ff = 32
  pn: Dict[str, Any] = {
      'DoubleRes_0': _plain_double_res(sd, 'pressurenet.flow_feature', used,
                                       3, ff),
      'DoubleRes_1': _plain_double_res(sd, 'pressurenet.first', used,
                                       ff, ch[0])}
  for i in range(L - 1):   # down.{i} = Sequential(MaxPool2d, double_res)
    pn[f'DoubleRes_{2 + i}'] = _plain_double_res(
        sd, f'pressurenet.down.{i}.1', used, ch[i], ch[i + 1])
  for i, ch_o in enumerate(ch[-2::-1]):
    pn[f'ConvTranspose_{i}'] = _conv_transpose(
        sd, f'pressurenet.up.{i}.0', used)
    pn[f'DoubleRes_{L + 1 + i}'] = _plain_double_res(
        sd, f'pressurenet.up_conv.{i}', used, ch_o * 2 + ff, ch_o)
  pn[f'DoubleRes_{2 * L}'] = _plain_double_res(sd, 'pressurenet.end.0', used,
                                               ch[0], ch[0] // 2)
  pn['Conv_0'] = _conv(sd, 'pressurenet.end.1', used)
  pn[f'DoubleRes_{2 * L + 1}'] = _plain_double_res(sd, 'pressurenet.end.2',
                                                   used, ch[0] // 2, 1)
  pn['Conv_1'] = _conv(sd, 'pressurenet.end.3', used)

  unconsumed = sorted(k for k in sd if k not in used)
  if unconsumed:
    raise ValueError(
        'torch state_dict keys not consumed by the PINN layout '
        f'(checkpoint/config mismatch?): {unconsumed[:8]}'
        f'{" ..." if len(unconsumed) > 8 else ""}')
  return {'flownet': flownet, 'pressurenet': pn}


def convert_reference_pinn_checkpoint(ckpt: Any, config,
                                      tx: Optional[Any] = None):
  """Full reference PINN checkpoint -> ``TrainState``.

  ``ckpt`` is the ``info=0`` dual-optimizer payload (reference
  utils.py:48-54: 'model', 'ema', 'step', 'optimizer_1'/'optimizer_2').
  Both torch optimizer states are dropped for a fresh dual-LR optimizer
  (pinn/losses.get_pinn_optimizer; torch Adam moments are layout-coupled,
  see the module docstring)."""
  import jax.numpy as jnp

  from b_pinn_kalman_filter_tpu.train import state as state_lib

  if isinstance(ckpt, (str, os.PathLike)):
    import torch
    ckpt = torch.load(ckpt, map_location='cpu', weights_only=False)
  if ckpt.get('info', 0) != 0:
    raise ValueError('info!=0 is the single-optimizer score-model layout; '
                     'use convert_reference_checkpoint')

  sd = strip_module_prefix(ckpt['model'])
  params = pinn_params_from_torch_state_dict(sd, config)
  if ckpt.get('ema') is not None:
    ema_sd = substitute_ema_shadow(sd, ckpt['ema'])
    ema_params = pinn_params_from_torch_state_dict(ema_sd, config)
  else:
    ema_params = jax.tree_util.tree_map(np.copy, params)

  if tx is None:
    from b_pinn_kalman_filter_tpu.pinn import losses as pinn_losses
    tx = pinn_losses.get_pinn_optimizer(config)

  state = state_lib.create_train_state(params, tx, config.model.ema_rate)
  return state.replace(step=jnp.asarray(int(ckpt.get('step', 0)), jnp.int32),
                       ema_params=ema_params)


def mlp_params_from_torch_state_dict(state_dict: Dict[str, Any], config,
                                     shape: Sequence[int] = (1, 3, 3, 1)
                                     ) -> Dict[str, Any]:
  """Reference MLP score model (models/ddpm.py:187-202) -> flax params.

  Torch keys are ``nn.fc{i}.weight/bias`` (the ``nn.Sequential`` attribute
  is literally named ``nn``); flax uses auto-named ``Dense_{i}``.

  Flatten-order fix: the torch model reshapes NCHW images to length
  ``L = C*H*W`` vectors in **CHW** element order; our flax MLP flattens
  NHWC inputs in **HWC** order.  The first layer's input dim and the last
  layer's output dim are therefore permuted (hidden dims in between carry
  no spatial meaning and transfer unchanged), so the converted network is
  the exact same function of the image.
  """
  state_dict = strip_module_prefix(state_dict)
  C = config.data.num_channels
  H = W = config.data.image_size
  # perm[hwc_index] = chw_index for the same (h, w, c) site.
  hh, ww, cc = np.meshgrid(np.arange(H), np.arange(W), np.arange(C),
                           indexing='ij')
  perm = ((cc * H + hh) * W + ww).reshape(-1)

  n_layers = len(shape) - 1
  params = {}
  for i in range(n_layers):
    kernel = _np(state_dict[f'nn.fc{i}.weight']).T
    bias = _np(state_dict[f'nn.fc{i}.bias'])
    if i == 0:
      kernel = kernel[perm, :]
    if i == n_layers - 1:
      kernel = kernel[:, perm]
      bias = bias[perm]
    params[f'Dense_{i}'] = {'kernel': kernel, 'bias': bias}
  return params


def substitute_ema_shadow(state_dict: Dict[str, Any],
                          ema_state: Dict[str, Any],
                          extra_exclude: Sequence[str] = ()) -> Dict[str, Any]:
  """Rebuild a state_dict with EMA shadow tensors in place of the params.

  ``shadow_params`` is a flat list of the ``requires_grad`` parameters in
  ``model.parameters()`` order (reference models/ema.py:28-29): for the
  reference score models that is the state-dict key order with the
  ``sigmas`` buffer removed (the only buffer; GroupNorm carries no running
  stats) — plus, for fourier-embedding NCSN++, the frozen
  ``GaussianFourierProjection.W`` (a ``requires_grad=False`` nn.Parameter,
  reference layerspp.py:37, hence also absent from the shadow list; pass
  it via ``extra_exclude``).
  """
  shadows = list(ema_state['shadow_params'])
  exclude = {'sigmas', *extra_exclude}
  param_keys = [k for k in state_dict if k not in exclude]
  if len(param_keys) != len(shadows):
    raise ValueError(
        f'{len(shadows)} EMA shadow tensors vs {len(param_keys)} params')
  out = dict(state_dict)
  for k, s in zip(param_keys, shadows):
    out[k] = s
  return out


def convert_reference_checkpoint(ckpt: Any, config,
                                 tx: Optional[Any] = None):
  """Full reference checkpoint (path or loaded dict) -> ``TrainState``.

  ``ckpt`` is the ``torch.save`` payload from reference utils.py:109-128
  (``info=1`` single-optimizer score-model layout).  Returns a TrainState
  with converted ``params`` + ``ema_params``, the saved ``step``, and a
  FRESH optimizer state (``tx.init``; built from ``config.optim`` when
  ``tx`` is None) — see module docstring for why torch Adam moments don't
  transfer.
  """
  import jax.numpy as jnp

  from b_pinn_kalman_filter_tpu.train import state as state_lib

  if isinstance(ckpt, (str, os.PathLike)):
    import torch
    ckpt = torch.load(ckpt, map_location='cpu', weights_only=False)

  if ckpt.get('info', 1) != 1:
    raise ValueError(
        'info!=1 is the dual-optimizer PINN layout (reference '
        'utils.py:111-120); this converter handles score-model (ddpm) '
        'checkpoints')

  sd = strip_module_prefix(ckpt['model'])
  # Dispatch on the registry name the config selects (reference
  # models/utils.py registry: 'mlp' is the only non-ModuleList score model).
  ema_exclude: Tuple[str, ...] = ()
  if config.model.name == 'mlp':
    convert = lambda d: mlp_params_from_torch_state_dict(d, config)
  elif config.model.name == 'ncsnpp':
    convert = lambda d: ncsnpp_params_from_torch_state_dict(d, config)
    if config.model.embedding_type.lower() == 'fourier':
      # Frozen fourier W is requires_grad=False => not in the EMA shadow
      # list (see substitute_ema_shadow); it is all_modules.0 by ctor order.
      ema_exclude = ('all_modules.0.W',)
  elif config.model.name in ('ncsnv2_64', 'ncsnv2_128', 'ncsnv2_256'):
    convert = lambda d: ncsnv2_params_from_torch_state_dict(d, config)
  elif config.model.name == 'ncsn':
    convert = lambda d: ncsn_params_from_torch_state_dict(d, config)
  else:
    convert = lambda d: ddpm_params_from_torch_state_dict(d, config)
  params = convert(sd)
  if 'ema' in ckpt and ckpt['ema'] is not None:
    ema_sd = substitute_ema_shadow(sd, ckpt['ema'], extra_exclude=ema_exclude)
    ema_params = convert(ema_sd)
  else:
    ema_params = jax.tree_util.tree_map(np.copy, params)

  if tx is None:
    from b_pinn_kalman_filter_tpu.core import losses
    tx = losses.get_optimizer(config)

  state = state_lib.create_train_state(params, tx, config.model.ema_rate)
  return state.replace(
      step=jnp.asarray(int(ckpt.get('step', 0)), jnp.int32),
      ema_params=ema_params)
