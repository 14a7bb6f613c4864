"""Winograd F(2x2, 3x3) convolution for TPU.

Arithmetic-reduction rewrite of the stride-1 SAME 3x3 convolutions that
dominate the score U-Nets (reference models use torch.nn.Conv2d via
ddpm_conv3x3, reference models/layers.py:113; the CUDA reference leaves
conv lowering to cuDNN).  Winograd F(2x2,3x3) computes each 2x2 output
tile with 16 multiplies instead of 36 — a 2.25x reduction in MXU work:

    Y = A^T [ (G g G^T) (.) (B^T d B) ] A      (Lavin & Gray, 2015)

with the standard F(2,3) transforms (exact in real arithmetic; entries are
0 / +-1 / +-1/2, so the data transforms are pure adds on the VPU):

    B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
    G   = [[1,0,0],[1/2,1/2,1/2],[1/2,-1/2,1/2],[0,0,1]]
    A^T = [[1,1,1,0],[0,1,-1,-1]]

Layout: NHWC activations, HWIO kernels (same as flax nn.Conv), so this is
a drop-in for the hot Conv3x3 path.  The 16 per-position contractions run
as one batched (16, P, Cin) x (16, Cin, Cout) dot_general on the MXU with
f32 accumulation; data transforms are explicit add/sub chains (no 4x4
matmuls).  Everything is jnp, so jax.grad/jit/vmap compose — the DPS
grad-through-score path differentiates straight through it.

XLA computes the same convolution directly at ~40-75% MFU; at N=1000
reverse steps the sampler is MXU-bound, so the 2.25x multiply reduction is
the only way past the direct conv's speed-of-light (BASELINE.md round 2).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _bt_1d(d0, d1, d2, d3):
  """Apply B^T along one axis: rows of B^T d for F(2,3)."""
  return (d0 - d2, d1 + d2, d2 - d1, d1 - d3)


def _at_1d(m0, m1, m2, m3):
  """Apply A^T along one axis for F(2,3)."""
  return (m0 + m1 + m2, m1 - m2 - m3)


# G for the kernel transform (applied in f32; kernels are small).
_G = np.array([[1.0, 0.0, 0.0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0.0, 0.0, 1.0]], np.float32)


def transform_kernel(kernel: jax.Array) -> jax.Array:
  """G g G^T: (3, 3, Cin, Cout) -> (4, 4, Cin, Cout), computed in f32.

  Loop-invariant in samplers/train steps — XLA hoists it out of scans.
  """
  g = kernel.astype(jnp.float32)
  return jnp.einsum('au,bv,uvio->abio', _G, _G, g)


def winograd_conv3x3(x: jax.Array, kernel: jax.Array,
                     bias: Optional[jax.Array] = None,
                     compute_dtype: Optional[jnp.dtype] = None) -> jax.Array:
  """Stride-1 SAME 3x3 correlation (= flax nn.Conv semantics), NHWC/HWIO.

  Equals ``lax.conv_general_dilated(x, kernel, (1,1), 'SAME')`` up to
  floating-point rounding.  ``compute_dtype`` is the MXU input dtype
  (defaults to x.dtype); accumulation is always f32.
  """
  if compute_dtype is None:
    compute_dtype = x.dtype
  B, H, W, Cin = x.shape
  assert kernel.shape[:2] == (3, 3) and kernel.shape[2] == Cin, kernel.shape
  Cout = kernel.shape[3]
  nH, nW = -(-H // 2), -(-W // 2)  # ceil

  # SAME padding for 3x3 plus right/bottom alignment to full 2x2 tiles.
  xp = jnp.pad(x.astype(compute_dtype),
               ((0, 0), (1, 2 * nH - H + 1), (1, 2 * nW - W + 1), (0, 0)))

  # d[u][v][b, th, tw, c] = xp[b, 2*th + u, 2*tw + v, c]
  d = [[xp[:, u:u + 2 * nH:2, v:v + 2 * nW:2, :] for v in range(4)]
       for u in range(4)]

  # V = B^T d B as two 1-D passes of adds.
  rows = [_bt_1d(*d[u]) for u in range(4)]           # B^T applied on v-axis
  V = [_bt_1d(rows[0][j], rows[1][j], rows[2][j], rows[3][j])
       for j in range(4)]                             # ... then on u-axis
  # V[j][i] corresponds to position (i on u-axis, j on v-axis).
  Vs = jnp.stack([V[j][i] for i in range(4) for j in range(4)])  # (16,B,nH,nW,C)

  U = transform_kernel(kernel).astype(compute_dtype)  # (4,4,Cin,Cout)
  Ur = U.reshape(16, Cin, Cout)

  P = B * nH * nW
  M = jax.lax.dot_general(
      Vs.reshape(16, P, Cin), Ur,
      dimension_numbers=(((2,), (1,)), ((0,), (0,))),
      preferred_element_type=jnp.float32)             # (16, P, Cout)
  M = M.reshape(4, 4, B, nH, nW, Cout)

  # Y = A^T M A, in f32.
  cols = [_at_1d(M[0, j], M[1, j], M[2, j], M[3, j]) for j in range(4)]
  Y = [_at_1d(cols[0][p], cols[1][p], cols[2][p], cols[3][p])
       for p in range(2)]                             # Y[p][q]: (B,nH,nW,Cout)
  out = jnp.stack([Y[p][q] for p in range(2) for q in range(2)])
  out = out.reshape(2, 2, B, nH, nW, Cout).transpose(2, 3, 0, 4, 1, 5)
  out = out.reshape(B, 2 * nH, 2 * nW, Cout)[:, :H, :W, :]

  if bias is not None:
    out = out + bias.astype(jnp.float32)
  return out.astype(compute_dtype)


def winograd_applicable(x_shape, kernel_shape, stride=1, dilation=1,
                        min_channels: int = 32) -> bool:
  """Dispatch guard: Winograd pays off for stride-1, dilation-1 3x3 convs
  with enough channels to fill MXU tiles (tiny Cout like the final RGB
  conv stays on the direct path)."""
  return (stride == 1 and dilation == 1
          and tuple(kernel_shape[:2]) == (3, 3)
          and x_shape[-1] >= min_channels
          and kernel_shape[-1] >= min_channels)


# ---------------------------------------------------------------------------
# Fast dispatch path used by models/layers.Conv3x3.
# ---------------------------------------------------------------------------

def _direct_conv(x, kernel, bias):
  out = jax.lax.conv_general_dilated(
      x, kernel.astype(x.dtype), (1, 1), 'SAME',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
      preferred_element_type=jnp.float32)
  return (out + bias.astype(jnp.float32)).astype(x.dtype)


@jax.custom_vjp
def _fused_conv(x, kernel, bias):
  """Pallas Winograd forward; backward via XLA's direct-conv transposes
  (the same convolution — Winograd is an exact rewrite, so mixing the two
  differs only in rounding)."""
  from b_pinn_kalman_filter_tpu.ops import winograd_pallas as wp
  cin, cout = kernel.shape[2], kernel.shape[3]
  U = transform_kernel(kernel).astype(x.dtype).reshape(16, cin, cout)
  # 'dot1' is the only Mosaic-clean schedule today ('dot3' trips a
  # concatenate layout limitation — see winograd_pallas._kernel).
  return wp.winograd_conv3x3_fused(x, U, bias, variant='dot1')


def _fused_conv_fwd(x, kernel, bias):
  return _fused_conv(x, kernel, bias), (x, kernel, bias)


def _fused_conv_bwd(res, g):
  x, kernel, bias = res
  _, vjp = jax.vjp(_direct_conv, x, kernel, bias)
  return vjp(g)


_fused_conv.defvjp(_fused_conv_fwd, _fused_conv_bwd)


def conv3x3_fast(x: jax.Array, kernel: jax.Array,
                 bias: Optional[jax.Array] = None,
                 compute_dtype: Optional[jnp.dtype] = None) -> jax.Array:
  """3x3 SAME stride-1 conv: fused Pallas Winograd on TPU when the shape
  fits, XLA direct conv otherwise.  bf16-in / bf16-out with f32 accumulation
  either way."""
  from b_pinn_kalman_filter_tpu.ops import winograd_pallas as wp
  if compute_dtype is None:
    compute_dtype = x.dtype
  x = x.astype(compute_dtype)
  cin, cout = kernel.shape[2], kernel.shape[3]
  if bias is None:
    bias = jnp.zeros((cout,), jnp.float32)
  from b_pinn_kalman_filter_tpu.ops.backend import is_tpu_backend
  if is_tpu_backend() and wp.fits_fused_kernel(x.shape, cin, cout):
    return _fused_conv(x, kernel, bias)
  return _direct_conv(x, kernel, bias)
