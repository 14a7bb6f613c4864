"""FlowNet-style local correlation cost volume
(reference: op/correlation.py — 3 inline CUDA kernels via CuPy).

Semantics (kernel_Correlation_updateOutput, reference correlation.py:34-102):
for displacements (dy, dx) in [-3, 3]^2 scaled by ``stride``,

    out[b, yo, xo, (dy+3)*7 + (dx+3)]
      = mean_c f1[b, c, yo*s, xo*s] * f2[b, c, yo*s + dy*s, xo*s + dx*s]

with zero padding out of bounds and output spatial dims ceil(H/s), ceil(W/s).

TPU-native: 49 statically-shifted elementwise products reduced over channels
— XLA fuses the pad/slice/multiply/mean chain into one loop nest; no custom
kernel needed (the work is bandwidth-bound VPU math, not MXU).
Layout NHWC; gradients via autodiff (the reference hand-writes both input
gradients, correlation.py:104-230).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_D = 3  # max displacement (7x7 window)


def correlation(f1: Array, f2: Array, stride: int = 1) -> Array:
  """Local correlation: f1, f2 (B, H, W, C) -> (B, ceil(H/s), ceil(W/s), 49)."""
  B, H, W, C = f1.shape
  s = int(stride)
  pad = _D * s
  f2p = jnp.pad(f2, [(0, 0), (pad, pad), (pad, pad), (0, 0)])

  f1s = f1[:, ::s, ::s, :]
  Ho, Wo = f1s.shape[1], f1s.shape[2]

  outs = []
  for dy in range(-_D, _D + 1):
    for dx in range(-_D, _D + 1):
      oy = pad + dy * s
      ox = pad + dx * s
      shifted = jax.lax.dynamic_slice(
          f2p, (0, oy, ox, 0), (B, H, W, C))[:, ::s, ::s, :]
      outs.append(jnp.mean(f1s * shifted, axis=-1))
  return jnp.stack(outs, axis=-1)


def correlation_ref(f1, f2, stride: int = 1):
  """Naive loop reference (numerics oracle for tests)."""
  import numpy as np
  f1 = np.asarray(f1)
  f2 = np.asarray(f2)
  B, H, W, C = f1.shape
  s = stride
  Ho = -(-H // s)
  Wo = -(-W // s)
  out = np.zeros((B, Ho, Wo, 49), np.float32)
  for b in range(B):
    for yo in range(Ho):
      for xo in range(Wo):
        y1, x1 = yo * s, xo * s
        for tc in range(49):
          dy = (tc // 7 - 3) * s
          dx = (tc % 7 - 3) * s
          y2, x2 = y1 + dy, x1 + dx
          if 0 <= y2 < H and 0 <= x2 < W:
            out[b, yo, xo, tc] = (f1[b, y1, x1] * f2[b, y2, x2]).mean()
  return out
