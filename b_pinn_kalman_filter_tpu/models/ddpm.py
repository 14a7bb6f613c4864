"""DDPM U-Net score network in flax (reference: models/ddpm.py:39-183).

Structural (not index-walked) flax redesign of the DDPM U-Net: the reference
builds a flat ``nn.ModuleList`` and walks it with a manual counter; here the
architecture is expressed directly, which XLA fuses into one compiled program.
Layout is NHWC; compute dtype configurable (bf16 for MXU).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from b_pinn_kalman_filter_tpu.models import layers, registry


@registry.register_model(name='ddpm')
class DDPM(nn.Module):
  """config-driven DDPM U-Net ('ddpm' registry name)."""
  config: Any

  @nn.compact
  def __call__(self, x, labels, train=True):
    config = self.config
    act = layers.get_act(config)
    nf = config.model.nf
    ch_mult = config.model.ch_mult
    num_res_blocks = config.model.num_res_blocks
    attn_resolutions = config.model.attn_resolutions
    dropout = config.model.dropout
    resamp_with_conv = config.model.resamp_with_conv
    num_resolutions = len(ch_mult)
    # MXU compute dtype (params stay float32; flax casts per-layer).
    dtype = jnp.dtype(config.tpu.compute_dtype) if 'tpu' in config else jnp.float32
    winograd = bool(config.tpu.get('winograd', False)) if 'tpu' in config else False
    # Fused GroupNorm+act Pallas kernel (ops/groupnorm_pallas.py): one HBM
    # read+write per norm instead of XLA's multi-pass lowering.
    fused_gn = (bool(config.tpu.get('fused_groupnorm', False))
                if 'tpu' in config else False)

    # config.tpu.remat: jax.checkpoint each resblock — activations are
    # recomputed in the backward pass, trading FLOPs for HBM (needed by the
    # deep / 256^2 configs).
    block_cls = layers.ResnetBlockDDPM
    if 'tpu' in config and config.tpu.get('remat', False):
      block_cls = layers.remat_block(layers.ResnetBlockDDPM)
    ResnetBlock = lambda out_ch=None: block_cls(
        act=act, out_ch=out_ch, dropout=dropout, dtype=dtype,
        winograd=winograd, fused_gn=fused_gn)

    if config.model.conditional:
      # Condition on noise levels (timestep embedding MLP).
      temb = layers.get_timestep_embedding(labels, nf)
      temb = nn.Dense(nf * 4, kernel_init=layers.default_init(),
                      bias_init=nn.initializers.zeros, dtype=dtype)(temb)
      temb = nn.Dense(nf * 4, kernel_init=layers.default_init(),
                      bias_init=nn.initializers.zeros, dtype=dtype)(act(temb))
    else:
      temb = None

    if config.data.centered:
      h = x           # input already in [-1, 1]
    else:
      h = 2 * x - 1.  # rescale [0, 1] -> [-1, 1]
    h = h.astype(dtype)

    # Downsampling path
    hs = [layers.Conv3x3(nf, dtype=dtype, winograd=winograd)(h)]
    for i_level in range(num_resolutions):
      for i_block in range(num_res_blocks):
        h = ResnetBlock(nf * ch_mult[i_level])(hs[-1], temb, train)
        if h.shape[1] in attn_resolutions:
          h = layers.AttnBlock(dtype=dtype)(h)
        hs.append(h)
      if i_level != num_resolutions - 1:
        hs.append(layers.Downsample(with_conv=resamp_with_conv,
                                    dtype=dtype)(hs[-1]))

    # Bottleneck
    h = hs[-1]
    h = ResnetBlock()(h, temb, train)
    h = layers.AttnBlock(dtype=dtype)(h)
    h = ResnetBlock()(h, temb, train)

    # Upsampling path
    for i_level in reversed(range(num_resolutions)):
      for i_block in range(num_res_blocks + 1):
        h = ResnetBlock(nf * ch_mult[i_level])(
            jnp.concatenate([h, hs.pop()], axis=-1), temb, train)
      if h.shape[1] in attn_resolutions:
        h = layers.AttnBlock(dtype=dtype)(h)
      if i_level != 0:
        h = layers.Upsample(with_conv=resamp_with_conv, dtype=dtype,
                            winograd=winograd)(h)

    assert not hs
    h = act(nn.GroupNorm(num_groups=min(32, h.shape[-1]), epsilon=1e-6)(
        h.astype(jnp.float32)))
    h = layers.Conv3x3(config.data.num_channels, init_scale=0.)(h)

    if config.model.scale_by_sigma:
      # NCSN-style output scaling by the noise level of each sample.
      sigmas = jnp.asarray(registry.get_sigmas(config), jnp.float32)
      used_sigmas = sigmas[labels.astype(jnp.int32)]
      h = h / used_sigmas[:, None, None, None]
    return h


UNet = DDPM


@registry.register_model(name='mlp')
class MLP(nn.Module):
  """Flat MLP baseline score model (reference: models/ddpm.py:187-202)."""
  config: Any
  shape: Sequence[int] = (1, 3, 3, 1)

  @nn.compact
  def __call__(self, x, labels, train=True):
    config = self.config
    C = config.data.num_channels
    H = W = config.data.image_size
    L = C * H * W
    h = x.reshape(-1, L)
    for i, b in enumerate(self.shape[1:]):
      h = nn.Dense(L * b)(h)
      if i != len(self.shape) - 2:
        h = jax.nn.relu(h)
    return h.reshape(-1, H, W, C)
