"""NCSN++ score network in flax (reference: models/ncsnpp.py:34-381).

Structural NHWC redesign (the reference index-walks a flat ModuleList);
supports both resblock types, FIR resampling, progressive input/output
pyramids, and fourier/positional embeddings.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from b_pinn_kalman_filter_tpu.models import layers, layerspp, registry


@registry.register_model(name='ncsnpp')
class NCSNpp(nn.Module):
  """NCSN++ model ('ncsnpp' registry name)."""
  config: Any

  @nn.compact
  def __call__(self, x, time_cond, train=True):
    config = self.config
    act = layers.get_act(config)
    nf = config.model.nf
    ch_mult = config.model.ch_mult
    num_res_blocks = config.model.num_res_blocks
    attn_resolutions = config.model.attn_resolutions
    dropout = config.model.dropout
    resamp_with_conv = config.model.resamp_with_conv
    num_resolutions = len(ch_mult)
    conditional = config.model.conditional
    fir = config.model.fir
    fir_kernel = tuple(config.model.fir_kernel)
    skip_rescale = config.model.skip_rescale
    resblock_type = config.model.resblock_type.lower()
    progressive = config.model.progressive.lower()
    progressive_input = config.model.progressive_input.lower()
    embedding_type = config.model.embedding_type.lower()
    init_scale = config.model.init_scale
    assert progressive in ['none', 'output_skip', 'residual']
    assert progressive_input in ['none', 'input_skip', 'residual']
    assert embedding_type in ['fourier', 'positional']
    combine_method = config.model.progressive_combine.lower()
    # MXU compute dtype (params stay float32).
    dtype = jnp.dtype(config.tpu.compute_dtype) if 'tpu' in config else jnp.float32
    # Fused GroupNorm+act Pallas kernel (ops/groupnorm_pallas.py).
    fused_gn = (bool(config.tpu.get('fused_groupnorm', False))
                if 'tpu' in config else False)

    AttnBlock = functools.partial(layerspp.AttnBlockpp,
                                  init_scale=init_scale,
                                  skip_rescale=skip_rescale,
                                  dtype=dtype)
    Upsample = functools.partial(layerspp.Upsample, with_conv=resamp_with_conv,
                                 fir=fir, fir_kernel=fir_kernel)
    Downsample = functools.partial(layerspp.Downsample,
                                   with_conv=resamp_with_conv,
                                   fir=fir, fir_kernel=fir_kernel)
    # config.tpu.remat: jax.checkpoint each resblock — activations are
    # recomputed in the backward pass, trading FLOPs for HBM (needed by the
    # deep / 256^2 configs).
    remat = 'tpu' in config and config.tpu.get('remat', False)
    maybe_remat = layers.remat_block if remat else (lambda cls: cls)
    if resblock_type == 'ddpm':
      ResnetBlock = functools.partial(
          maybe_remat(layerspp.ResnetBlockDDPMpp), act=act, dropout=dropout,
          init_scale=init_scale, skip_rescale=skip_rescale, dtype=dtype,
          fused_gn=fused_gn)
    elif resblock_type == 'biggan':
      ResnetBlock = functools.partial(
          maybe_remat(layerspp.ResnetBlockBigGANpp), act=act, dropout=dropout,
          fir=fir, fir_kernel=fir_kernel, init_scale=init_scale,
          skip_rescale=skip_rescale, dtype=dtype, fused_gn=fused_gn)
    else:
      raise ValueError(f'resblock type {resblock_type} unrecognized.')

    # --- timestep / noise-level embedding ---
    if embedding_type == 'fourier':
      assert config.training.continuous, \
          "Fourier features are only used for continuous training."
      used_sigmas = time_cond
      temb = layerspp.GaussianFourierProjection(
          embedding_size=nf, scale=config.model.fourier_scale)(
              jnp.log(used_sigmas))
    else:
      timesteps = time_cond
      sigmas = jnp.asarray(registry.get_sigmas(config), jnp.float32)
      used_sigmas = sigmas[time_cond.astype(jnp.int32)]
      temb = layers.get_timestep_embedding(timesteps, nf)

    if conditional:
      temb = nn.Dense(nf * 4, kernel_init=layers.default_init(),
                      bias_init=nn.initializers.zeros, dtype=dtype)(temb)
      temb = nn.Dense(nf * 4, kernel_init=layers.default_init(),
                      bias_init=nn.initializers.zeros, dtype=dtype)(act(temb))
    else:
      temb = None

    if not config.data.centered:
      x = 2 * x - 1.   # input in [0, 1] -> [-1, 1]
    x = x.astype(dtype)

    # --- downsampling path ---
    input_pyramid = x if progressive_input != 'none' else None
    hs = [layers.Conv3x3(nf)(x)]
    for i_level in range(num_resolutions):
      for i_block in range(num_res_blocks):
        h = ResnetBlock(out_ch=nf * ch_mult[i_level])(hs[-1], temb, train)
        if h.shape[1] in attn_resolutions:
          h = AttnBlock()(h)
        hs.append(h)

      if i_level != num_resolutions - 1:
        if resblock_type == 'ddpm':
          h = Downsample()(hs[-1])
        else:
          h = ResnetBlock(down=True)(hs[-1], temb, train)

        if progressive_input == 'input_skip':
          input_pyramid = layerspp.Downsample(
              fir=fir, fir_kernel=fir_kernel, with_conv=False)(input_pyramid)
          h = layerspp.Combine(dim2=h.shape[-1],
                               method=combine_method)(input_pyramid, h)
        elif progressive_input == 'residual':
          input_pyramid = layerspp.Downsample(
              out_ch=h.shape[-1], fir=fir, fir_kernel=fir_kernel,
              with_conv=True)(input_pyramid)
          if skip_rescale:
            input_pyramid = (input_pyramid + h) / np.sqrt(2.)
          else:
            input_pyramid = input_pyramid + h
          h = input_pyramid
        hs.append(h)

    # --- bottleneck ---
    h = hs[-1]
    h = ResnetBlock()(h, temb, train)
    h = AttnBlock()(h)
    h = ResnetBlock()(h, temb, train)

    # --- upsampling path ---
    pyramid = None
    for i_level in reversed(range(num_resolutions)):
      for i_block in range(num_res_blocks + 1):
        h = ResnetBlock(out_ch=nf * ch_mult[i_level])(
            jnp.concatenate([h, hs.pop()], axis=-1), temb, train)

      if h.shape[1] in attn_resolutions:
        h = AttnBlock()(h)

      if progressive != 'none':
        if i_level == num_resolutions - 1:
          if progressive == 'output_skip':
            pyramid = act(layerspp._gn(h.shape[-1])(h))
            pyramid = layers.Conv3x3(config.data.num_channels,
                                     init_scale=init_scale)(pyramid)
          elif progressive == 'residual':
            pyramid = act(layerspp._gn(h.shape[-1])(h))
            pyramid = layers.Conv3x3(h.shape[-1])(pyramid)
        else:
          if progressive == 'output_skip':
            pyramid = layerspp.Upsample(
                fir=fir, fir_kernel=fir_kernel, with_conv=False)(pyramid)
            pyramid_h = act(layerspp._gn(h.shape[-1])(h))
            pyramid_h = layers.Conv3x3(config.data.num_channels,
                                       init_scale=init_scale)(pyramid_h)
            pyramid = pyramid + pyramid_h
          elif progressive == 'residual':
            pyramid = layerspp.Upsample(
                out_ch=h.shape[-1], fir=fir, fir_kernel=fir_kernel,
                with_conv=True)(pyramid)
            if skip_rescale:
              pyramid = (pyramid + h) / np.sqrt(2.)
            else:
              pyramid = pyramid + h
            h = pyramid

      if i_level != 0:
        if resblock_type == 'ddpm':
          h = Upsample()(h)
        else:
          h = ResnetBlock(up=True)(h, temb, train)

    assert not hs

    if progressive == 'output_skip':
      h = pyramid
    else:
      h = act(layerspp._gn(h.shape[-1])(h.astype(jnp.float32)))
      h = layers.Conv3x3(config.data.num_channels, init_scale=init_scale)(h)

    h = h.astype(jnp.float32)
    if config.model.scale_by_sigma:
      h = h / used_sigmas[:, None, None, None]
    return h
