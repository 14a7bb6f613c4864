"""Pallas TPU kernel: fully-fused Navier–Stokes step.

One kernel per batch element runs the whole update chain — pressure-gradient
velocity update, CIP self-advection of u and v, pressure relaxation, density
CIP advection — with every intermediate resident in VMEM.  The XLA path
(ops/ns_step.py) materializes the stage outputs in HBM between the three
updates; at UKF sigma-point batch sizes this kernel is the perf-critical
stencil SURVEY §2.1 N5 calls out.

The math is shared with ops/ns_step.py (the jnp helpers are pure and trace
fine inside a Pallas kernel body), so the two paths cannot drift.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
  from jax.experimental.pallas import tpu as pltpu
  _HAVE_TPU_PALLAS = True
except ImportError:  # pragma: no cover
  _HAVE_TPU_PALLAS = False

from b_pinn_kalman_filter_tpu.ops import ns_step as ref

Array = jax.Array


def _ns_step_kernel(dens_ref, u_ref, v_ref, p_ref,
                    dens_out, u_out, v_out, p_out, *, dt: float, dx: float):
  dens = dens_ref[0]
  u = u_ref[0]
  v = v_ref[0]
  p = p_ref[0]

  # Velocity: non-advective pressure-gradient update + CIP self-advection.
  dp_dx, dp_dy = ref.gradient(p, dx)
  u_n = u - dp_dx * dt
  v_n = v - dp_dy * dt
  du_dx, du_dy = ref.gradient(u_n, dx)
  u2 = ref.cip_advect(u_n, du_dx, du_dy, u_n, v_n, dt, dx)
  dv_dx, dv_dy = ref.gradient(v_n, dx)
  v2 = ref.cip_advect(v_n, dv_dx, dv_dy, u_n, v_n, dt, dx)

  # Pressure relaxation.
  p2 = ref.update_pressure(u2, v2, p, dt, dx)

  # Density CIP advection.
  dd_dx, dd_dy = ref.gradient(dens, dx)
  d2 = ref.cip_advect(dens, dd_dx, dd_dy, u2, v2, dt, dx)

  dens_out[0] = d2
  u_out[0] = u2
  v_out[0] = v2
  p_out[0] = p2


def ns_step_fused(dens: Array, u: Array, v: Array, p: Array, dt: float,
                  dx: float, interpret: bool = False
                  ) -> Tuple[Array, Array, Array, Array]:
  """Fused NS step on (B, H, W) fields via one Pallas kernel per batch row."""
  B, H, W = dens.shape
  kernel = functools.partial(_ns_step_kernel, dt=float(dt), dx=float(dx))
  spec = pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                      memory_space=pltpu.VMEM if (_HAVE_TPU_PALLAS and
                                                  not interpret) else None)
  out_shape = [jax.ShapeDtypeStruct((B, H, W), dens.dtype)] * 4
  return tuple(pl.pallas_call(
      kernel,
      grid=(B,),
      in_specs=[spec] * 4,
      out_specs=[spec] * 4,
      out_shape=out_shape,
      interpret=interpret,
  )(dens, u, v, p))


def ns_step_auto(dens: Array, u: Array, v: Array, p: Array, dt: float,
                 dx: float) -> Tuple[Array, Array, Array, Array]:
  """Fused Pallas step on TPU; XLA composition elsewhere."""
  platform = jax.devices()[0].platform
  if platform == 'tpu' and _HAVE_TPU_PALLAS:
    try:
      return ns_step_fused(dens, u, v, p, dt, dx)
    except Exception:
      pass
  return ref.ns_step(dens, u, v, p, dt, dx)
