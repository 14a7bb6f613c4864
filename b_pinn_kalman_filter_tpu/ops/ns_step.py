"""Explicit incompressible Navier–Stokes stepper
(reference: op/ns_step_kernel.cu + op/ns_step.cpp).

Semantics (square grids; kernel indexing maps 'x' to the width axis):

* gradients: central differences, one-sided at the edges
  (update_gradient_kernel, ns_step_kernel.cu:97-112);
* density/velocity advection: CIP (cubic interpolated propagation) with
  sign-dependent upwind neighbors (cip_advect_kernel, :115-158), plus the
  plain variant (advect_kernel, :161-178);
* velocity: pressure-gradient update then CIP self-advection of u and v
  (update_velocity, ns_step.cpp:59-92);
* pressure: neighbor average + divergence/strain source terms
  (pressure_update_kernel, :205-234) with mirror boundary.

TPU-native: fully vectorized jnp stencils (pad/slice shifts fused by XLA),
batched over leading dims, differentiable (the CUDA op is forward-only).
Layout: fields are (B, H, W) single-channel; velocity is a (u, v) pair.
sign(0) is treated as +1 in denominators — the CUDA kernel produces NaN at
exactly-zero velocity; the X=0 factor makes the result identical otherwise.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _shift_x(f: Array, s) -> Array:
  """f[..., y, x + s] with reflect boundary (clamp_x, ns_step_kernel.cu:77-79).

  ``s`` may be a traced integer array of the same shape (gather path)."""
  W = f.shape[-1]
  idx = jnp.arange(W) + s if jnp.ndim(s) == 0 else \
      jax.lax.broadcasted_iota(jnp.int32, f.shape, f.ndim - 1) + s
  idx = jnp.abs(idx)
  idx = jnp.where(idx > W - 1, 2 * W - 2 - idx, idx)
  if jnp.ndim(s) == 0:
    return f[..., idx]
  return jnp.take_along_axis(f, idx, axis=-1)


def _shift_y(f: Array, s) -> Array:
  """f[..., y + s, x] with reflect boundary."""
  H = f.shape[-2]
  if jnp.ndim(s) == 0:
    idx = jnp.arange(H) + s
    idx = jnp.abs(idx)
    idx = jnp.where(idx > H - 1, 2 * H - 2 - idx, idx)
    return f[..., idx, :]
  idx = jax.lax.broadcasted_iota(jnp.int32, f.shape, f.ndim - 2) + s
  idx = jnp.abs(idx)
  idx = jnp.where(idx > H - 1, 2 * H - 2 - idx, idx)
  return jnp.take_along_axis(f, idx, axis=-2)


def _shift_xy(f: Array, sy: Array, sx: Array) -> Array:
  """f[..., cl(y + sy[y,x]), cl(x + sx[y,x])] — joint 2D gather with both
  offsets evaluated at the CENTER cell (composing _shift_x then _shift_y
  would evaluate sx at the shifted row)."""
  H, W = f.shape[-2], f.shape[-1]
  iy = jax.lax.broadcasted_iota(jnp.int32, f.shape, f.ndim - 2) + sy
  iy = jnp.abs(iy)
  iy = jnp.where(iy > H - 1, 2 * H - 2 - iy, iy)
  ix = jax.lax.broadcasted_iota(jnp.int32, f.shape, f.ndim - 1) + sx
  ix = jnp.abs(ix)
  ix = jnp.where(ix > W - 1, 2 * W - 2 - ix, ix)
  flat = f.reshape(f.shape[:-2] + (H * W,))
  idx = iy * W + ix
  return jnp.take_along_axis(flat, idx.reshape(idx.shape[:-2] + (H * W,)),
                             axis=-1).reshape(f.shape)


def gradient(field: Array, dx: float) -> Tuple[Array, Array]:
  """(df/dx, df/dy): central differences, one-sided at edges
  (diff_x/diff_y, ns_step_kernel.cu:49-75).

  Pure static-shift + mask formulation (no scatter/dynamic_slice) so the
  same code lowers inside Pallas TPU kernels."""
  W = field.shape[-1]
  H = field.shape[-2]
  col = jax.lax.broadcasted_iota(jnp.int32, field.shape, field.ndim - 1)
  row = jax.lax.broadcasted_iota(jnp.int32, field.shape, field.ndim - 2)

  fxp = _sshift_x(field, 1)    # f[x+1] (reflect at the right edge)
  fxm = _sshift_x(field, -1)   # f[x-1] (reflect at the left edge)
  central_x = (fxp - fxm) / dx / 2
  left = (fxp - field) / dx
  right = (field - fxm) / dx
  df_dx = jnp.where(col == 0, left,
                    jnp.where(col == W - 1, right, central_x))

  fyp = _sshift_y(field, 1)
  fym = _sshift_y(field, -1)
  central_y = (fyp - fym) / dx / 2
  bottom = (fyp - field) / dx
  top = (field - fym) / dx
  df_dy = jnp.where(row == 0, bottom,
                    jnp.where(row == H - 1, top, central_y))
  return df_dx, df_dy


def _sshift_x(f: Array, s: int) -> Array:
  """f[..., y, x + s] for static s = ±1 with reflect boundary — a pure
  slice/concat, no gather (TPU/Pallas-friendly)."""
  if s == -1:   # value at x-1; x=0 reflects to 1
    return jnp.concatenate([f[..., :, 1:2], f[..., :, :-1]], axis=-1)
  else:         # value at x+1; x=W-1 reflects to W-2
    return jnp.concatenate([f[..., :, 1:], f[..., :, -2:-1]], axis=-1)


def _sshift_y(f: Array, s: int) -> Array:
  if s == -1:
    return jnp.concatenate([f[..., 1:2, :], f[..., :-1, :]], axis=-2)
  else:
    return jnp.concatenate([f[..., 1:, :], f[..., -2:-1, :]], axis=-2)


def cip_advect(dens: Array, dens_dx: Array, dens_dy: Array, u: Array,
               v: Array, dt: float, dx: float) -> Array:
  """CIP advection (cip_advect_kernel, ns_step_kernel.cu:115-158).

  The sign-dependent upwind neighbor (x - sign(u), y - sign(v)) is realized
  as a SELECT between the two static ±1 reflect-shifts instead of a dynamic
  gather — XLA fuses the shifts/selects into one stencil loop (a gather
  would serialize on the VPU)."""
  xp = u >= 0.0   # x_s = +1 where true
  yp = v >= 0.0
  x_sf = jnp.where(xp, 1.0, -1.0).astype(dens.dtype)
  y_sf = jnp.where(yp, 1.0, -1.0).astype(dens.dtype)

  def sel_x(f):
    return jnp.where(xp, _sshift_x(f, -1), _sshift_x(f, 1))

  def sel_y(f):
    return jnp.where(yp, _sshift_y(f, -1), _sshift_y(f, 1))

  d_xm = sel_x(dens)
  d_ym = sel_y(dens)
  # (x - x_s, y - y_s) corner: select among the four static double-shifts
  # with both signs taken at the center cell.
  d_mm = _sshift_y(_sshift_x(dens, -1), -1)
  d_mp = _sshift_y(_sshift_x(dens, -1), 1)
  d_pm = _sshift_y(_sshift_x(dens, 1), -1)
  d_pp = _sshift_y(_sshift_x(dens, 1), 1)
  d_xym = jnp.where(xp, jnp.where(yp, d_mm, d_mp),
                    jnp.where(yp, d_pm, d_pp))
  dx_xm = sel_x(dens_dx)
  dx_ym = sel_y(dens_dx)
  dy_xm = sel_x(dens_dy)
  dy_ym = sel_y(dens_dy)

  tmp1 = dens - d_ym - d_xm + d_xym
  tmp2 = d_xm - dens
  tmp3 = d_ym - dens

  x_den = x_sf * dx ** 3
  y_den = y_sf * dx ** 3

  a = (x_sf * (dx_xm + dens_dx) * dx - 2.0 * (-tmp2)) / x_den
  b = (y_sf * (dy_ym + dens_dy) * dx - 2.0 * (-tmp3)) / y_den
  c = (-tmp1 - x_sf * (dx_ym - dens_dx) * dx) / y_den
  d = (-tmp1 - y_sf * (dy_xm - dens_dy) * dx) / x_den
  e = (3.0 * tmp2 + x_sf * (dx_xm + 2.0 * dens_dx) * dx) / dx / dx
  f = (3.0 * tmp3 + y_sf * (dy_ym + 2.0 * dens_dy) * dx) / dx / dx
  g = (-(dy_xm - dens_dy) + c * dx * dx) / (x_sf * dx)

  X = -u * dt
  Y = -v * dt
  return (((a * X + c * Y + e) * X + g * Y + dens_dx) * X
          + ((b * Y + d * X + f) * Y + dens_dy) * Y
          + dens)


def upwind_advect(dens: Array, dens_dx: Array, dens_dy: Array, u: Array,
                  v: Array, dt: float) -> Array:
  """Plain advection (advect_kernel, ns_step_kernel.cu:161-178)."""
  return dens - dt * (u * dens_dx + v * dens_dy)


def update_density(dens: Array, u: Array, v: Array, dt: float, dx: float,
                   method: int = 0) -> Array:
  """Density step (update_density, ns_step.cpp:45-57).  (B, H, W) fields."""
  dens_dx, dens_dy = gradient(dens, dx)
  if method == 0:
    return cip_advect(dens, dens_dx, dens_dy, u, v, dt, dx)
  return upwind_advect(dens, dens_dx, dens_dy, u, v, dt)


def update_velocity(u: Array, v: Array, pres: Array, dt: float,
                    dx: float) -> Tuple[Array, Array]:
  """Velocity step: non-advective pressure-gradient update, then CIP
  self-advection of u and v by the updated field
  (update_velocity, ns_step.cpp:59-92)."""
  dp_dx, dp_dy = gradient(pres, dx)
  u_n = u - dp_dx * dt
  v_n = v - dp_dy * dt

  du_dx, du_dy = gradient(u_n, dx)
  u_out = cip_advect(u_n, du_dx, du_dy, u_n, v_n, dt, dx)

  dv_dx, dv_dy = gradient(v_n, dx)
  v_out = cip_advect(v_n, dv_dx, dv_dy, u_n, v_n, dt, dx)
  return u_out, v_out


def update_pressure(u: Array, v: Array, pres: Array, dt: float,
                    dx: float) -> Array:
  """Pressure relaxation step (pressure_update_kernel,
  ns_step_kernel.cu:205-234)."""
  p_xm = _sshift_x(pres, -1)
  p_xp = _sshift_x(pres, 1)
  p_ym = _sshift_y(pres, -1)
  p_yp = _sshift_y(pres, 1)
  aver_p = 0.25 * (p_xm + p_xp + p_ym + p_yp)

  # sub_x = vel(x+1) - vel(x-1); sub_y = vel(y+1) - vel(y-1)
  u_xx = _sshift_x(u, 1) - _sshift_x(u, -1)   # sub_x.x
  v_xx = _sshift_x(v, 1) - _sshift_x(v, -1)   # sub_x.y
  u_yy = _sshift_y(u, 1) - _sshift_y(u, -1)   # sub_y.x
  v_yy = _sshift_y(v, 1) - _sshift_y(v, -1)   # sub_y.y

  return (aver_p
          + (u_xx * u_xx + v_yy * v_yy + u_yy * v_xx) / 8.0
          - dx * (u_xx + v_yy) / (8 * dt))


def ns_step(dens: Array, u: Array, v: Array, pres: Array, dt: float,
            dx: float) -> Tuple[Array, Array, Array, Array]:
  """One full NS update in the simulator's order
  (reference pinn_kalman/simulator.py:38-63 / ukf_utils.py:107-111):
  velocity, then pressure, then density."""
  u, v = update_velocity(u, v, pres, dt, dx)
  pres = update_pressure(u, v, pres, dt, dx)
  dens = update_density(dens, u, v, dt, dx)
  return dens, u, v, pres
