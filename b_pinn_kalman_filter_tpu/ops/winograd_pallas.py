"""Fused Pallas TPU kernel for Winograd F(2x2,3x3) convolution.

The pure-XLA formulation in ops/winograd.py materializes the transformed
input V (4x the activation) and the per-position products M in HBM, which
makes it bandwidth-bound and slower than XLA's direct conv.  This kernel
fuses input transform -> 16 MXU contractions -> output transform (+bias)
entirely in VMEM, so per conv the HBM traffic is one read of the padded
input and one write of the output — while the MXU does 2.25x fewer
multiplies than a direct 3x3 conv.

Layout strategy (Mosaic lowers >2D strided slices to unsupported gathers,
so everything here is unit-stride):

* The stride-2 tile decomposition along W is packed into the LANE dim:
  ``(B, Hp, Wp, C) -> (B, Hp, Wp//2, 2*C)`` is a row-major no-op in HBM,
  and even/odd-W extraction becomes lane slicing at 128-aligned
  boundaries.
* The stride-2 decomposition along H splits the (untiled) H axis:
  ``(B, Hp, ...) -> (B, Hp//2, 2, ...)`` — also free — and parity
  selection becomes a middle-dim index.
* The output is written as ``(B, H//2, 2, W//2, 2*Cout)`` whose reshape
  back to NHWC is again a row-major no-op.

U = G g G^T (4,4,Cin,Cout) is precomputed outside (ops/winograd.py
``transform_kernel``) — loop-invariant in scanned samplers/train steps,
so XLA hoists it.

Used by models/layers.Conv3x3 via ops.winograd.winograd_conv3x3 when
running on TPU with even spatial dims and 128-multiple channels; the
backward pass (custom_vjp in ops/winograd.py) uses XLA's direct conv
transposes.  Replaces what the CUDA reference leaves to cuDNN (reference
models use torch Conv2d, models/layers.py:113); there is no reference
kernel to port — this is the TPU speed-of-light path for the score
U-Nets' dominant op.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, u_ref, b_ref, y_ref, *, variant: str):
  """One grid step: Bb whole images through the fused Winograd pipeline.

  x_ref: (Bb, nH+1, 2, nW+1, 2*C)   packed padded input (see module doc)
  u_ref: 'dot1': (16, Cin, Cout) transformed kernel;
         'dot3': (8, 3*Cin, Cout) with the A^T-over-j combination folded in
  b_ref: (1, Cout)                   bias (zeros if none), f32
  y_ref: (Bb, nH, 2, nW, 2*Cout)     packed output

  'dot1' runs 16 (P,C)x(C,Co) contractions and combines A^T over j on the
  VPU (minimum MXU work, 16/36 of direct).  'dot3' runs 8 (P,3C)x(3C,Co)
  contractions with the j-combination inside the MXU (24/36 of direct but
  far fewer VPU ops) — faster where the 'dot1' pipeline is VPU-bound
  (large spatial extent, C=128).
  """
  Bb, nHp, _, nWp, C2 = x_ref.shape
  C = C2 // 2
  nH, nW = nHp - 1, nWp - 1
  Co = y_ref.shape[-1] // 2
  P = Bb * nH * nW

  xb = x_ref[:]

  # B^T along H: tile row u = 2a + s -> block row a (unit slice), parity s.
  x0 = xb[:, 0:nH, 0]
  x1 = xb[:, 0:nH, 1]
  x2 = xb[:, 1:nH + 1, 0]
  x3 = xb[:, 1:nH + 1, 1]
  rs = (x0 - x2, x1 + x2, x2 - x1, x1 - x3)   # each (Bb, nH, nWp, 2C)

  bias = b_ref[:].astype(jnp.float32)          # (1, Co)
  acc = [[jnp.broadcast_to(bias, (P, Co)).astype(jnp.float32)
          for _ in range(2)] for _ in range(2)]

  # A^T row coefficients: Y[0] takes (+,+,+,0), Y[1] takes (0,+,-,-) over i.
  at = ((1, 1, 1, 0), (0, 1, -1, -1))

  def dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

  for i in range(4):
    r = rs[i]
    # B^T along W: tile col v = 2b + t -> lane half t, block col b.
    w0 = r[:, :, 0:nW, 0:C]
    w1 = r[:, :, 0:nW, C:]
    w2 = r[:, :, 1:nW + 1, 0:C]
    w3 = r[:, :, 1:nW + 1, C:]
    vs = (w0 - w2, w1 + w2, w2 - w1, w1 - w3)  # each (Bb, nH, nW, C)

    if variant == 'dot3':
      cat_a = jnp.concatenate([vs[0], vs[1], vs[2]], axis=-1).reshape(P, 3 * C)
      cat_b = jnp.concatenate([vs[1], vs[2], vs[3]], axis=-1).reshape(P, 3 * C)
      t = (dot(cat_a, u_ref[2 * i]), dot(cat_b, u_ref[2 * i + 1]))
    else:
      m = [dot(vs[j].reshape(P, C), u_ref[4 * i + j]) for j in range(4)]
      t = (m[0] + m[1] + m[2], m[1] - m[2] - m[3])  # A^T over j

    for p in range(2):
      c = at[p][i]
      if c == 1:
        acc[p][0] = acc[p][0] + t[0]
        acc[p][1] = acc[p][1] + t[1]
      elif c == -1:
        acc[p][0] = acc[p][0] - t[0]
        acc[p][1] = acc[p][1] - t[1]

  out_dtype = y_ref.dtype
  for p in range(2):
    y = jnp.concatenate(
        [acc[p][0].reshape(Bb, nH, nW, Co),
         acc[p][1].reshape(Bb, nH, nW, Co)], axis=-1).astype(out_dtype)
    y_ref[:, :, p, :, :] = y


def _pick_batch_block(B: int, H: int, W: int, Cin: int, Cout: int) -> int:
  """Largest divisor of B keeping the working set well under VMEM."""
  nH, nW = H // 2, W // 2
  for bb in (8, 4, 2, 1):
    if B % bb:
      continue
    P = bb * nH * nW
    est = (bb * (nH + 1) * 2 * (nW + 1) * 2 * Cin * 2   # input block
           + 4 * P * (nW + 1) // nW * 2 * Cin * 2       # H-pass rows
           + 4 * P * Cin * 2                            # one i's V slices
           + 4 * P * Cout * 4                           # m_j products
           + 4 * P * Cout * 4                           # accumulators
           + bb * H * W * Cout * 2                      # output block
           + 16 * Cin * Cout * 2)                       # U
    if est < 10 * 1024 * 1024:
      return bb
  return 1


def fold_at_into_u(U: jax.Array) -> jax.Array:
  """(16, Cin, Cout) -> (8, 3*Cin, Cout) for the 'dot3' kernel variant:
  row 2i   = [U[i,0]; U[i,1]; U[i,2]]          (t0 = m0+m1+m2)
  row 2i+1 = [U[i,1]; -U[i,2]; -U[i,3]]        (t1 = m1-m2-m3)
  """
  Cin, Cout = U.shape[1], U.shape[2]
  U4 = U.reshape(4, 4, Cin, Cout)
  rows = []
  for i in range(4):
    rows.append(jnp.concatenate([U4[i, 0], U4[i, 1], U4[i, 2]], axis=0))
    rows.append(jnp.concatenate([U4[i, 1], -U4[i, 2], -U4[i, 3]], axis=0))
  return jnp.stack(rows)


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'variant', 'batch_block'))
def winograd_conv3x3_fused(x: jax.Array, U: jax.Array,
                           bias: Optional[jax.Array] = None,
                           interpret: bool = False,
                           variant: str = 'dot1',
                           batch_block: int = 0) -> jax.Array:
  """Fused Winograd conv: x (B,H,W,Cin) with even H,W; U (16,Cin,Cout).

  Returns (B,H,W,Cout) in x.dtype.  SAME padding, stride 1.
  ``variant``/``batch_block`` select the kernel schedule (see _kernel);
  batch_block=0 auto-picks.
  """
  B, H, W, Cin = x.shape
  assert H % 2 == 0 and W % 2 == 0, (H, W)
  Cout = U.shape[-1]
  if bias is None:
    bias = jnp.zeros((Cout,), jnp.float32)

  nH, nW = H // 2, W // 2
  xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
  # Row-major no-op repack: (B, 2nH+2, 2nW+2, C) -> (B, nH+1, 2, nW+1, 2C).
  xp = xp.reshape(B, nH + 1, 2, nW + 1, 2 * Cin)
  bb = batch_block or _pick_batch_block(B, H, W, Cin, Cout)

  if variant == 'dot3':
    u_arg = fold_at_into_u(U)
    u_spec = pl.BlockSpec((8, 3 * Cin, Cout), lambda b: (0, 0, 0),
                          memory_space=pltpu.VMEM)
  else:
    u_arg = U
    u_spec = pl.BlockSpec((16, Cin, Cout), lambda b: (0, 0, 0),
                          memory_space=pltpu.VMEM)

  out = pl.pallas_call(
      functools.partial(_kernel, variant=variant),
      grid=(B // bb,),
      in_specs=[
          pl.BlockSpec((bb, nH + 1, 2, nW + 1, 2 * Cin),
                       lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
          u_spec,
          pl.BlockSpec((1, Cout), lambda b: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((bb, nH, 2, nW, 2 * Cout),
                             lambda b: (b, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((B, nH, 2, nW, 2 * Cout), x.dtype),
      cost_estimate=pl.CostEstimate(
          flops=2 * 16 * (B * H * W // 4) * Cin * Cout,
          bytes_accessed=(B * (H + 2) * (W + 2) * Cin * 2
                          + B * H * W * Cout * 2 + 16 * Cin * Cout * 2),
          transcendentals=0),
      interpret=interpret,
  )(xp, u_arg, bias.reshape(1, Cout).astype(jnp.float32))
  # Row-major no-op unpack back to NHWC.
  return out.reshape(B, H, W, Cout)


def fits_fused_kernel(x_shape, cin: int, cout: int) -> bool:
  """Dispatch guard for the fused kernel: even spatial dims and MXU-tile
  channel counts (lane dim = 128)."""
  B, H, W, _ = x_shape
  return (H % 2 == 0 and W % 2 == 0 and H >= 4 and W >= 4
          and cin % 128 == 0 and cout % 128 == 0)
