"""Differentiable bilinear grid sampling (reference: op/grid_sample_kernel.cu).

The reference needs 668 lines of CUDA solely to make *second-order*
gradients of ``grid_sample`` work (PINN losses differentiate through the
semi-Lagrangian warp).  In JAX the op is gather + lerp, and ``jax.grad``
composes to any order for free — exactly the note in SURVEY §2.1 N3.

Conventions follow torch ``F.grid_sample``: grid values in [-1, 1],
``grid[..., 0]`` indexes width (x), ``grid[..., 1]`` height (y);
``padding_mode`` in {'zeros', 'border'}; ``align_corners`` True/False.
Layout here is NHWC (grid is (B, Ho, Wo, 2) as in torch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _unnormalize(coord: Array, size: int, align_corners: bool) -> Array:
  if align_corners:
    return (coord + 1.0) / 2.0 * (size - 1)
  return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample_2d(input: Array, grid: Array, padding_mode: str = 'zeros',
                   align_corners: bool = True) -> Array:
  """Bilinear sample: input (B,H,W,C), grid (B,Ho,Wo,2) -> (B,Ho,Wo,C)."""
  assert padding_mode in ('zeros', 'border')
  B, H, W, C = input.shape
  x = _unnormalize(grid[..., 0], W, align_corners)
  y = _unnormalize(grid[..., 1], H, align_corners)

  x0 = jnp.floor(x)
  y0 = jnp.floor(y)
  x1, y1 = x0 + 1, y0 + 1
  wx = x - x0
  wy = y - y0

  def gather(ix, iy):
    ix_c = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
    iy_c = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
    vals = input[jnp.arange(B)[:, None, None], iy_c, ix_c]  # (B,Ho,Wo,C)
    if padding_mode == 'zeros':
      valid = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1))
      vals = vals * valid[..., None].astype(vals.dtype)
    return vals

  v00 = gather(x0, y0)
  v01 = gather(x1, y0)
  v10 = gather(x0, y1)
  v11 = gather(x1, y1)

  wx = wx[..., None]
  wy = wy[..., None]
  top = v00 * (1 - wx) + v01 * wx
  bot = v10 * (1 - wx) + v11 * wx
  return top * (1 - wy) + bot * wy


def grid_sample_3d(input: Array, grid: Array, padding_mode: str = 'zeros',
                   align_corners: bool = True) -> Array:
  """Trilinear sample: input (B,D,H,W,C), grid (B,Do,Ho,Wo,3) with
  grid[...,(0,1,2)] = (x, y, z) -> (B,Do,Ho,Wo,C)."""
  assert padding_mode in ('zeros', 'border')
  B, D, H, W, C = input.shape
  x = _unnormalize(grid[..., 0], W, align_corners)
  y = _unnormalize(grid[..., 1], H, align_corners)
  z = _unnormalize(grid[..., 2], D, align_corners)

  x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
  wx, wy, wz = x - x0, y - y0, z - z0

  def gather(ix, iy, iz):
    ix_c = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
    iy_c = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
    iz_c = jnp.clip(iz, 0, D - 1).astype(jnp.int32)
    vals = input[jnp.arange(B)[:, None, None, None], iz_c, iy_c, ix_c]
    if padding_mode == 'zeros':
      valid = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
               & (iz >= 0) & (iz <= D - 1))
      vals = vals * valid[..., None].astype(vals.dtype)
    return vals

  out = 0.
  for dz, wz_ in ((0, 1 - wz), (1, wz)):
    for dy, wy_ in ((0, 1 - wy), (1, wy)):
      for dx, wx_ in ((0, 1 - wx), (1, wx)):
        v = gather(x0 + dx, y0 + dy, z0 + dz)
        out = out + v * (wx_ * wy_ * wz_)[..., None]
  return out


def make_normalized_grid(B: int, H: int, W: int, dtype=jnp.float32) -> Array:
  """Identity sampling grid in [-1,1], shape (B, H, W, 2) with (x, y) order
  (the cached grid of reference models/flownet.py:7-15)."""
  xs = jnp.linspace(-1.0, 1.0, W, dtype=dtype)
  ys = jnp.linspace(-1.0, 1.0, H, dtype=dtype)
  gx, gy = jnp.meshgrid(xs, ys)          # (H, W)
  grid = jnp.stack([gx, gy], axis=-1)    # (H, W, 2)
  return jnp.broadcast_to(grid, (B, H, W, 2))
