"""PINN: physics-informed flow + pressure inference
(reference: pinn_kalman/pinn.py).

The reference computes NS residuals with ``torch.autograd.grad`` over
coordinate-image inputs and needs a custom CUDA kernel for second-order
grid_sample gradients; here the residuals are nested ``jax.grad`` calls over
a pure function of the (x, y, t) fields — same sum-then-grad semantics
(pinn.py:84-92), arbitrary-order derivatives for free.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from b_pinn_kalman_filter_tpu.models.ddpm import UNet, MLP
from b_pinn_kalman_filter_tpu.models.flownet import (FlowNet, PressureNet,
                                                     project)

Array = jax.Array


def get_flow_model(config):
  """Architecture dispatch (reference pinn.py:20-30).

  'unet' (= the DDPM U-Net, reference models/ddpm.py:183 ``UNet = DDPM``)
  and 'mlp' construct for dispatch parity, but neither matches the
  ``(f1, f2, x, y, t, size)`` call signature PINN uses — the reference
  crashes identically at pinn.py:64 on these branches; only
  flownet/liteflownet compose."""
  arch = config.model.arch
  if arch == 'flownet':
    return FlowNet(config)
  elif arch == 'liteflownet':
    from b_pinn_kalman_filter_tpu.models.liteflownet import LiteFlowNet
    return LiteFlowNet(config)
  elif arch == 'unet':
    return UNet(config)
  elif arch == 'mlp':
    return MLP(config)
  raise NotImplementedError


class PINN(nn.Module):
  """Flow + pressure composition (reference pinn.py:34-114).

  Input:  f1, f2 (B, H, W, 1) consecutive frames; x, y (B, H, W, 1)
          coordinate fields; t (B,) times.
  Output: (cascaded_flow list, pressure).
  """
  config: Any

  def setup(self):
    self.flownet = get_flow_model(self.config)
    self.pressurenet = PressureNet(self.config)

  def __call__(self, f1, f2, x, y, t, size=None, train=True):
    flow = self.flownet(f1, f2, x, y, t, size=size, train=train)
    pressure = self.pressurenet(flow, x, y, t, train=train)
    return flow, pressure

  def flow_only(self, f1, f2, x, y, t, size=None, train=True):
    return self.flownet(f1, f2, x, y, t, size=size, train=train)

  def pressure_only(self, cascaded_flow, x, y, t, train=True):
    return self.pressurenet(cascaded_flow, x, y, t, train=train)


def pinn_step(ft: Array, u: Array, dt: float) -> Array:
  """Density advection by the predicted flow (reference pinn.py:113-114)."""
  return project(ft, u, dt)


def equation_mse(apply_uvp: Callable, x: Array, y: Array, t: Array,
                 Re: float) -> Array:
  """Incompressible-NS residual loss (reference pinn.py:72-111).

  ``apply_uvp(x, y, t) -> (u, v, p)`` must be a pure function of the
  coordinate fields (closing over params, f1, f2).  Implements the exact
  sum-then-grad semantics of the reference: each first-order partial is
  d(sum(field))/d(input pixel); each second-order term is torch's
  ``grad(u_x.sum(), x)`` — the Hessian-row-sum H.1, not the diagonal.

  **Formulation note (TPU, measured round 2).**  Two pass-count
  optimizations were built and benchmarked against this literal
  transcription: (a) one shared ``jax.vjp`` for all first-order partials
  plus forward-over-reverse HVPs for the second-order Hessian-row-sums,
  and (b) the same with shared reverse-over-reverse linearizations.  Both
  compute identical values (tests/test_pinn_residual_parity.py) but OOM
  HBM at the reference's 64^2/batch-64 phase-2 scale once the outer
  parameter gradient transposes the shared graphs (47.7G and 55.9G vs
  15.75G, XLA compile reports) — and ``jax.checkpoint`` cannot
  rematerialize through forward-mode.  The independent nested grads below
  are what XLA can actually schedule within HBM: each sum-then-grad
  subgraph is freed before the next, so "redundant" forwards are the
  memory-optimal schedule.  Keep the parity test if revisiting.

  Round 3 closed the question: microbatched gradient accumulation
  (``tpu.pinn_microbatch``) makes schedule (a) fit HBM, but the TPU
  compiler is OOM-killed on the resulting program at reference scale, and
  at a control scale where both compile, (a) runs ~2x SLOWER than this
  literal formulation (see :func:`equation_mse_fused` docstring +
  BASELINE.md round-3 section).  This literal transcription is the
  schedule of record on TPU.
  """

  def u_sum(x_, y_, t_):
    return jnp.sum(apply_uvp(x_, y_, t_)[0])

  def v_sum(x_, y_, t_):
    return jnp.sum(apply_uvp(x_, y_, t_)[1])

  def p_sum(x_, y_):
    return jnp.sum(apply_uvp(x_, y_, t)[2])

  u, v, p = apply_uvp(x, y, t)

  # First-order derivatives (reference pinn.py:84-86).
  u_x, u_y, u_t = jax.grad(u_sum, argnums=(0, 1, 2))(x, y, t)
  v_x, v_y, v_t = jax.grad(v_sum, argnums=(0, 1, 2))(x, y, t)
  p_x, p_y = jax.grad(p_sum, argnums=(0, 1))(x, y)

  # Second-order derivatives (reference pinn.py:89-92).
  u_xx = jax.grad(lambda x_: jnp.sum(
      jax.grad(u_sum, argnums=0)(x_, y, t)))(x)
  u_yy = jax.grad(lambda y_: jnp.sum(
      jax.grad(u_sum, argnums=1)(x, y_, t)))(y)
  v_xx = jax.grad(lambda x_: jnp.sum(
      jax.grad(v_sum, argnums=0)(x_, y, t)))(x)
  v_yy = jax.grad(lambda y_: jnp.sum(
      jax.grad(v_sum, argnums=1)(x, y_, t)))(y)

  # t is (B,): broadcast the time partials over space (reference :95-96).
  u_t = u_t[:, None, None, None]
  v_t = v_t[:, None, None, None]

  f_x = u_t + (u * u_x + v * u_y) + p_x - 1.0 / Re * (u_xx + u_yy)
  f_y = v_t + (u * v_x + v * v_y) + p_y - 1.0 / Re * (v_xx + v_yy)
  f_mass = u_x + v_y

  return (jnp.mean(f_x ** 2) + jnp.mean(f_y ** 2) + jnp.mean(f_mass ** 2))


def equation_mse_fused(apply_uvp: Callable, x: Array, y: Array, t: Array,
                       Re: float) -> Array:
  """Exact pass-count reduction of :func:`equation_mse` — identical values
  and gradients (tests/test_pinn_residual_parity.py), ~2-3x fewer network
  passes.

  * All first-order partials come from ONE shared linearization
    (``jax.vjp``) pulled back through three output cotangents, instead of
    three independent ``jax.grad`` calls each redoing the forward.
  * Each Laplacian term is a forward-over-reverse HVP row-sum:
    ``u_xx = jvp(x' -> d sum(u)/dx', ones)`` — the Hessian-row-sum H.1 the
    reference's ``grad(u_x.sum(), x)`` computes (sum-then-grad semantics).

  **Memory caveat (measured round 2):** differentiating this w.r.t. the
  network parameters at full phase-2 scale (64^2, batch 64) transposes the
  shared linearizations and OOMs HBM (47.7G vs 15.75G).  Use it ONLY under
  the microbatched gradient-accumulation schedule in
  ``pinn/losses.py:get_pinn_step_fn`` (``config.tpu.pinn_microbatch``),
  which bounds the live graph to one batch chunk.  Reference semantics
  anchor: pinn_kalman/pinn.py:72-111.

  **TPU verdict (measured round 3, real chip — this schedule LOSES; keep
  it off):** the microbatched step at reference scale (64^2, batch 64,
  C=16) fits HBM but the server-side TPU compiler itself is killed
  (SIGKILL after 22 min on the 6.2 MB MLIR).  At a 32^2/batch-16 control
  scale where both schedules compile, fused is ~2x SLOWER than the
  literal nested grads (96 ms vs 48.6 ms per residual gradient) with a
  longer compile (2275 s vs 1916 s): XLA maps plain reverse passes onto
  the MXU better than forward-over-reverse jvp-of-vjp chains, and the
  shared linearization's residency defeats fusion locality.  The literal
  schedule in :func:`equation_mse` stays the default everywhere
  (scripts/pinn_microbatch_bench.py --probe reproduces both numbers).
  """
  (u, v, p), pullback = jax.vjp(lambda x_, y_, t_: apply_uvp(x_, y_, t_),
                                x, y, t)
  one_u = jnp.ones_like(u)
  one_v = jnp.ones_like(v)
  one_p = jnp.ones_like(p)
  zero_u = jnp.zeros_like(u)
  zero_v = jnp.zeros_like(v)
  zero_p = jnp.zeros_like(p)

  u_x, u_y, u_t = pullback((one_u, zero_v, zero_p))
  v_x, v_y, v_t = pullback((zero_u, one_v, zero_p))
  # p_sum differentiates only (x, y) in the reference; the t cotangent is
  # simply unused (identical semantics).
  p_x, p_y, _ = pullback((zero_u, zero_v, one_p))

  one_x = jnp.ones_like(x)
  one_y = jnp.ones_like(y)

  def grad_x_of(field_idx):
    def g(x_):
      out, pb = jax.vjp(lambda xx: apply_uvp(xx, y, t), x_)
      cot = tuple(jnp.ones_like(o) if i == field_idx else jnp.zeros_like(o)
                  for i, o in enumerate(out))
      return pb(cot)[0]
    return g

  def grad_y_of(field_idx):
    def g(y_):
      out, pb = jax.vjp(lambda yy: apply_uvp(x, yy, t), y_)
      cot = tuple(jnp.ones_like(o) if i == field_idx else jnp.zeros_like(o)
                  for i, o in enumerate(out))
      return pb(cot)[0]
    return g

  # Hessian-row-sums via forward-over-reverse (jvp of a vjp with an
  # all-ones tangent): d/dx . 1 of [d sum(field)/dx].
  _, u_xx = jax.jvp(grad_x_of(0), (x,), (one_x,))
  _, u_yy = jax.jvp(grad_y_of(0), (y,), (one_y,))
  _, v_xx = jax.jvp(grad_x_of(1), (x,), (one_x,))
  _, v_yy = jax.jvp(grad_y_of(1), (y,), (one_y,))

  u_t = u_t[:, None, None, None]
  v_t = v_t[:, None, None, None]

  f_x = u_t + (u * u_x + v * u_y) + p_x - 1.0 / Re * (u_xx + u_yy)
  f_y = v_t + (u * v_x + v * v_y) + p_y - 1.0 / Re * (v_xx + v_yy)
  f_mass = u_x + v_y

  return (jnp.mean(f_x ** 2) + jnp.mean(f_y ** 2) + jnp.mean(f_mass ** 2))


def make_uvp_fn(model: PINN, params, f1, f2, size=None,
                train: bool = False) -> Callable:
  """Build the pure (x, y, t) -> (u, v, p) function for equation_mse."""

  def apply_uvp(x, y, t):
    flow, pres = model.apply({'params': params}, f1, f2, x, y, t,
                             size=size, train=train)
    fin = flow[-1]
    return fin[..., 0:1], fin[..., 1:2], pres

  return apply_uvp


def equation_mse_from_outputs(model: PINN, params, f1, f2, x, y, t,
                              Re: float, train: bool = False,
                              fused: bool = False) -> Array:
  """Convenience: residual loss recomputing the forward under grad
  (matches reference get_pinn_step_fn usage, losses.py:345).

  ``fused=True`` selects the shared-vjp/HVP schedule (equation_mse_fused)
  — exact, but only safe under microbatched outer gradients (see its
  docstring)."""
  fn = equation_mse_fused if fused else equation_mse
  return fn(make_uvp_fn(model, params, f1, f2, train=train), x, y, t, Re)
