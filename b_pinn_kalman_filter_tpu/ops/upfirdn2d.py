"""upfirdn2d: upsample -> FIR filter -> downsample in one fused op.

TPU-native redesign of the reference CUDA kernel (reference:
op/upfirdn2d_kernel.cu, numerics spec = the pure-torch CPU fallback
``upfirdn2d_native``, op/upfirdn2d.py:159-200).

The whole op is ONE ``lax.conv_general_dilated`` call: zero-stuffing is
``lhs_dilation``, FIR filtering is a depthwise correlation with the flipped
kernel, and downsampling is the window stride — XLA lowers this straight to
the TPU convolution hardware, and autodiff gives the custom double-backward
the reference hand-writes (op/upfirdn2d.py:19-142) for free.

Layout is NHWC.  A literal translation of the algorithm
(:func:`upfirdn2d_ref`) is kept as the numerics reference for tests.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def setup_kernel(k) -> np.ndarray:
  """Normalize a 1D (separable) or 2D FIR kernel to sum 1
  (reference models/up_or_down_sampling.py:181-188)."""
  k = np.asarray(k, dtype=np.float32)
  if k.ndim == 1:
    k = np.outer(k, k)
  k = k / np.sum(k)
  assert k.ndim == 2 and k.shape[0] == k.shape[1]
  return k


def upfirdn2d(x: Array, kernel: Array, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0)) -> Array:
  """Fused upsample-FIR-downsample on an NHWC batch.

  Semantics (reference upfirdn2d_native): zero-stuff by ``up``, pad by
  ``pad`` (negative = crop), convolve with ``kernel``, subsample by ``down``.
  """
  kernel = jnp.asarray(kernel, x.dtype)
  kh, kw = kernel.shape
  C = x.shape[-1]
  # Depthwise correlation with the flipped kernel == convolution with kernel.
  w = jnp.flip(kernel, (0, 1)).reshape(kh, kw, 1, 1)
  w = jnp.tile(w, (1, 1, 1, C))
  pad0, pad1 = pad
  # Zero-stuffing via lhs_dilation yields (H-1)*up+1 samples; the reference
  # keeps the trailing up-1 zeros, so fold them into the end padding.
  padding = ((pad0, pad1 + up - 1), (pad0, pad1 + up - 1))
  return jax.lax.conv_general_dilated(
      x, w,
      window_strides=(down, down),
      padding=padding,
      lhs_dilation=(up, up),
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
      feature_group_count=C)


def upfirdn2d_ref(x: Array, kernel: Array, up_x: int = 1, up_y: int = 1,
                  down_x: int = 1, down_y: int = 1, pad_x0: int = 0,
                  pad_x1: int = 0, pad_y0: int = 0, pad_y1: int = 0) -> Array:
  """Literal jnp transcription of the algorithm (numerics reference for
  tests; mirrors op/upfirdn2d.py:159-200 semantics in NHWC)."""
  B, in_h, in_w, C = x.shape
  kernel = jnp.asarray(kernel, x.dtype)
  kh, kw = kernel.shape

  # Zero-stuff upsample (each pixel followed by up-1 zeros).
  out = x.reshape(B, in_h, 1, in_w, 1, C)
  out = jnp.pad(out, [(0, 0), (0, 0), (0, up_y - 1), (0, 0), (0, up_x - 1), (0, 0)])
  out = out.reshape(B, in_h * up_y, in_w * up_x, C)

  # Pad (positive) then crop (negative).
  out = jnp.pad(out, [(0, 0), (max(pad_y0, 0), max(pad_y1, 0)),
                      (max(pad_x0, 0), max(pad_x1, 0)), (0, 0)])
  out = out[:, max(-pad_y0, 0): out.shape[1] - max(-pad_y1, 0),
            max(-pad_x0, 0): out.shape[2] - max(-pad_x1, 0), :]

  # Convolve with the kernel (correlate with the flipped kernel), depthwise.
  w = jnp.flip(kernel, (0, 1)).reshape(kh, kw, 1, 1)
  w = jnp.tile(w, (1, 1, 1, C))
  out = jax.lax.conv_general_dilated(
      out, w, window_strides=(1, 1), padding='VALID',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'), feature_group_count=C)

  # Subsample.
  out = out[:, ::down_y, ::down_x, :]
  out_h = (in_h * up_y + pad_y0 + pad_y1 - kh) // down_y + 1
  out_w = (in_w * up_x + pad_x0 + pad_x1 - kw) // down_x + 1
  assert out.shape == (B, out_h, out_w, C)
  return out
