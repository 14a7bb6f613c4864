"""Fused GroupNorm(+activation) Pallas TPU kernel.

The score U-Nets call ``act(GroupNorm(x))`` twice per resblock (~44 times
per DDPM++ forward, models/layers.py:270-281).  XLA lowers GroupNorm as a
multi-pass reduce + broadcast chain with f32 intermediates, so each call
re-reads the activation from HBM several times; microbenchmarks put it
~5x above the HBM roofline (BASELINE.md round-2 investigation).  This
kernel does one read + one write per activation: per-channel sums are
reduced in VMEM, folded to per-group statistics with two tiny
indicator-matrix contractions (keeping the lane dim = C, never C/G),
then normalization, affine, and SiLU are applied in registers.

There is no reference kernel to port — the reference gets GroupNorm from
torch (reference models/layers.py via nn.GroupNorm); this is the TPU
bandwidth-roofline path for it.

Differentiable via ``jax.custom_vjp``: the backward recomputes through a
pure-jnp reference formulation (DPS guidance differentiates the score net
inside the sampler, inverse/conditional_sampling.py, so the fused path
cannot be forward-only).

**Measured outcome (TPU v5e, BASELINE.md round 2): slower end-to-end.**
The DDPM++ sampler step goes 9.4 -> 12.4 ms with this kernel swapped in
for every resblock norm: each ``pallas_call`` is a fusion barrier, and
XLA's own GN lowering already keeps the stats chain fused into the
surrounding convs (ablation attributes only ~1.1 ms/eval to *all*
norm+act work).  Kept as an opt-in (``config.tpu.fused_groupnorm``,
default False) with full parity/grad tests; the honest conclusion — per-op
Pallas swaps inside an XLA-fused U-Net cost more than they save — is as
load-bearing as a speedup would have been.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

# Test hook: force interpret-mode dispatch on CPU so the wired model path
# (models/layers.norm_act) is exercisable off-TPU.
FORCE_INTERPRET = bool(os.environ.get('B_PINN_GN_INTERPRET'))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, scale_ref, bias_ref, gsel_ref, y_ref, *, act: str,
            eps: float):
  """One grid step: (Bb, HW, C) activations -> fused GN(+act).

  gsel_ref: (C, C) group-indicator matrix, gsel[i, j] = 1 iff channels i, j
  share a group.  x @ ... is never needed: per-channel sums (Bb, C) are
  contracted with gsel to produce per-channel *group* sums, so the lane
  dimension stays C throughout (C/G would be 4-8 lanes — dead VPU width).
  """
  x = x_ref[:].astype(jnp.float32)            # (Bb, HW, C)
  Bb, HW, C = x.shape

  csum = jnp.sum(x, axis=1)                   # (Bb, C)
  csq = jnp.sum(x * x, axis=1)                # (Bb, C)
  gsel = gsel_ref[:]                          # (C, C) f32

  def dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

  gsize = dot(jnp.ones((Bb, C), jnp.float32), gsel) * HW   # elems per group
  mean = dot(csum, gsel) / gsize                           # (Bb, C)
  var = dot(csq, gsel) / gsize - mean * mean

  inv = jax.lax.rsqrt(var + eps) * scale_ref[:].astype(jnp.float32)
  shift = bias_ref[:].astype(jnp.float32) - mean * inv
  y = x * inv[:, None, :] + shift[:, None, :]
  if act == 'silu':
    y = y * jax.nn.sigmoid(y)
  elif act == 'elu':
    y = jax.nn.elu(y)
  elif act != 'none':
    raise ValueError(act)
  y_ref[:] = y.astype(y_ref.dtype)


def _group_indicator(C: int, G: int) -> np.ndarray:
  g = np.repeat(np.arange(G), C // G)
  return (g[:, None] == g[None, :]).astype(np.float32)


def _pick_batch_block(B: int, HW: int, C: int) -> int:
  for bb in (16, 8, 4, 2, 1):
    if B % bb:
      continue
    # x block (bf16) + f32 working copy + output
    if bb * HW * C * (2 + 4 + 4) < 10 * 1024 * 1024:
      return bb
  return 1


def _reference_groupnorm_act(x, scale, bias, num_groups, act, eps):
  """Pure-jnp formulation (f32 stats) used for the custom-vjp backward."""
  B, H, W, C = x.shape
  g = x.astype(jnp.float32).reshape(B, H * W, num_groups, C // num_groups)
  mean = g.mean(axis=(1, 3), keepdims=True)
  var = g.var(axis=(1, 3), keepdims=True)
  g = (g - mean) * jax.lax.rsqrt(var + eps)
  y = g.reshape(B, H, W, C) * scale.astype(jnp.float32) \
      + bias.astype(jnp.float32)
  if act == 'silu':
    y = jax.nn.silu(y)
  elif act == 'elu':
    y = jax.nn.elu(y)
  return y.astype(x.dtype)


def groupnorm_act(x: jax.Array, scale: jax.Array, bias: jax.Array,
                  num_groups: int = 32, act: str = 'silu',
                  eps: float = 1e-6, interpret: bool = False) -> jax.Array:
  """Fused ``act(GroupNorm(x))``: x (B, H, W, C) -> same shape/dtype.

  scale/bias: (C,).  Requires C % num_groups == 0 and C % 128 == 0 (lane
  alignment); callers dispatch through :func:`fits_fused_groupnorm`.
  Differentiable: the VJP recomputes through the jnp reference formulation
  (one extra forward worth of FLOPs, only on grad paths such as DPS).
  """
  return _groupnorm_act_core(x, scale, bias, num_groups, act, eps, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _groupnorm_act_core(x, scale, bias, num_groups, act, eps, interpret):
  return _pallas_groupnorm_act(x, scale, bias, num_groups, act, eps,
                               interpret)


def _groupnorm_act_fwd(x, scale, bias, num_groups, act, eps, interpret):
  return (_pallas_groupnorm_act(x, scale, bias, num_groups, act, eps,
                                interpret),
          (x, scale, bias))


def _groupnorm_act_bwd(num_groups, act, eps, interpret, res, g):
  x, scale, bias = res
  _, vjp = jax.vjp(
      lambda x_, s_, b_: _reference_groupnorm_act(x_, s_, b_, num_groups,
                                                  act, eps), x, scale, bias)
  return vjp(g)


_groupnorm_act_core.defvjp(_groupnorm_act_fwd, _groupnorm_act_bwd)


@functools.partial(jax.jit, static_argnames=('num_groups', 'act', 'eps',
                                             'interpret'))
def _pallas_groupnorm_act(x, scale, bias, num_groups, act, eps, interpret):
  B, H, W, C = x.shape
  assert C % num_groups == 0 and C % 128 == 0, (C, num_groups)
  HW = H * W
  xr = x.reshape(B, HW, C)
  bb = _pick_batch_block(B, HW, C)
  gsel = jnp.asarray(_group_indicator(C, num_groups))

  out = pl.pallas_call(
      functools.partial(_kernel, act=act, eps=eps),
      grid=(B // bb,),
      in_specs=[
          pl.BlockSpec((bb, HW, C), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
          pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
          pl.BlockSpec((C, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((bb, HW, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((B, HW, C), x.dtype),
      cost_estimate=pl.CostEstimate(
          flops=10 * B * HW * C, transcendentals=B * HW * C,
          bytes_accessed=2 * B * HW * C * x.dtype.itemsize),
      interpret=interpret,
  )(xr, scale, bias, gsel)
  return out.reshape(B, H, W, C)


def fits_fused_groupnorm(shape, num_groups: int) -> bool:
  """Dispatch guard: 4D NHWC, lane-aligned channels, groups divide C, and
  the minimum per-block working set (bb=1) fits the 10 MB VMEM budget that
  :func:`_pick_batch_block` allocates against — otherwise the pallas_call
  would fail at compile instead of falling back to flax GroupNorm
  (ADVICE r2: e.g. 256x256x128 is ~80 MB/block even at bb=1)."""
  if len(shape) != 4:
    return False
  B, H, W, C = shape
  if C % 128 != 0 or num_groups <= 0 or C % num_groups != 0:
    return False
  # Same bytes-per-element model as _pick_batch_block (bf16 in + f32 work
  # + f32 out) at the smallest block.
  return H * W * C * (2 + 4 + 4) < 10 * 1024 * 1024
