"""On-device adaptive ODE integration (Dormand–Prince RK45 + fixed-grid RK4).

The reference integrates the probability-flow ODE with
``scipy.integrate.solve_ivp`` (reference: sampling.py:473, likelihood.py:99,
inverse/conditional_sampling.py:10-27), paying a device↔host round trip on
EVERY right-hand-side evaluation.  Here the whole solve lives inside one XLA
program: a ``lax.while_loop`` with PI step-size control (same 5(4) embedded
pair and error norm as scipy's RK45), so the score network never leaves the
TPU.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Dormand-Prince 5(4) Butcher tableau.
_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    np.array([]),
    np.array([1 / 5]),
    np.array([3 / 40, 9 / 40]),
    np.array([44 / 45, -56 / 15, 32 / 9]),
    np.array([19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]),
    np.array([9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]),
    np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]),
]
_B5 = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_B4 = np.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
                 -92097 / 339200, 187 / 2100, 1 / 40])

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 10.0
_ORDER_EXP = -1.0 / 5.0  # error estimator order 4 -> exponent -1/(4+1)


class ODEResult(NamedTuple):
  y: Array        # final state
  nfe: Array      # number of RHS evaluations
  status: Array   # 0 = success, 1 = max_steps exhausted


def _rms_norm(e: Array) -> Array:
  return jnp.sqrt(jnp.mean(e ** 2))


def _dp_step(fn: Callable, t: Array, y: Array, h: Array, k0: Array):
  """One Dormand–Prince step from (t, y) with step h and cached first stage k0.

  Returns (y5, err_est, k_last) where k_last is f at (t+h, y5) — FSAL.
  """
  ks = [k0]
  for i in range(1, 7):
    ti = t + _C[i] * h
    yi = y
    for j, aij in enumerate(_A[i]):
      yi = yi + h * aij * ks[j]
    ks.append(fn(ti, yi))
  y5 = y
  for i in range(7):
    if float(_B5[i]) != 0.0:
      y5 = y5 + h * _B5[i] * ks[i]
  # y5 equals the 7th stage input (FSAL): ks[6] = f(t+h, y5).
  err = jnp.zeros_like(y)
  for i in range(7):
    d = float(_B5[i] - _B4[i])
    if d != 0.0:
      err = err + (h * d) * ks[i]
  return y5, err, ks[6]


def odeint_dopri(fn: Callable[[Array, Array], Array], y0: Array, t0: float,
                 t1: float, rtol: float = 1e-5, atol: float = 1e-5,
                 max_steps: int = 5000, first_step: float = None) -> ODEResult:
  """Adaptive Dormand–Prince 5(4) integration of ``dy/dt = fn(t, y)``.

  Integrates from ``t0`` to ``t1`` (either direction).  Entirely on-device:
  jit/vmap/grad-compatible (``fn`` may contain a neural network).
  Matches scipy ``solve_ivp(method='RK45')`` semantics: scaled RMS error
  norm with ``atol + rtol * max(|y|, |y_new|)``, PI-free basic controller.
  """
  t0 = jnp.asarray(t0, y0.dtype)
  t1 = jnp.asarray(t1, y0.dtype)
  direction = jnp.sign(t1 - t0)
  span = jnp.abs(t1 - t0)
  if first_step is None:
    h0 = direction * span / 100.0
  else:
    h0 = direction * jnp.asarray(first_step, y0.dtype)

  def cond(carry):
    t, y, h, k, nfe, done, fail = carry
    return jnp.logical_and(~done, ~fail)

  def body(carry):
    t, y, h, k, nfe, done, fail = carry
    # Clip step to not overshoot t1.
    h = direction * jnp.minimum(jnp.abs(h), jnp.abs(t1 - t))
    y_new, err, k_new = _dp_step(fn, t, y, h, k)
    scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
    err_norm = _rms_norm(err / scale)
    accept = err_norm <= 1.0

    factor = jnp.where(
        err_norm == 0.0, _MAX_FACTOR,
        jnp.clip(_SAFETY * err_norm ** _ORDER_EXP, _MIN_FACTOR, _MAX_FACTOR))
    h_next = h * factor

    t = jnp.where(accept, t + h, t)
    y = jnp.where(accept, y_new, y)
    k = jnp.where(accept, k_new, k)
    nfe = nfe + 6
    done = jnp.abs(t - t0) >= span * (1 - 1e-12)
    return (t, y, h_next, k, nfe, done, fail)

  k0 = fn(t0, y0)
  carry = (t0, y0, h0, k0, jnp.asarray(1, jnp.int32),
           jnp.asarray(False), jnp.asarray(False))

  # Bounded while_loop: wrap with an explicit step counter for safety.
  def cond_counted(c):
    i, inner = c
    return jnp.logical_and(i < max_steps, cond(inner))

  def body_counted(c):
    i, inner = c
    return i + 1, body(inner)

  steps, (t, y, h, k, nfe, done, fail) = jax.lax.while_loop(
      cond_counted, body_counted, (jnp.asarray(0, jnp.int32), carry))
  status = jnp.where(done, 0, 1).astype(jnp.int32)
  return ODEResult(y=y, nfe=nfe, status=status)


def odeint_rk4(fn: Callable[[Array, Array], Array], y0: Array, t0: float,
               t1: float, n_steps: int) -> Tuple[Array, int]:
  """Fixed-grid classic RK4 via lax.scan (deterministic NFE = 4 * n_steps)."""
  ts = jnp.linspace(t0, t1, n_steps + 1)

  def step(y, i):
    t = ts[i]
    h = ts[i + 1] - ts[i]
    k1 = fn(t, y)
    k2 = fn(t + h / 2, y + h / 2 * k1)
    k3 = fn(t + h / 2, y + h / 2 * k2)
    k4 = fn(t + h, y + h * k3)
    y = y + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
    return y, None

  y, _ = jax.lax.scan(step, y0, jnp.arange(n_steps))
  return y, 4 * n_steps


def odeint_euler(fn: Callable[[Array, Array], Array], y0: Array, t0: float,
                 t1: float, n_steps: int) -> Tuple[Array, int]:
  """Fixed-step Euler via lax.scan (reference 'fixed' solver,
  inverse/conditional_sampling.py:17-26)."""
  ts = jnp.linspace(t0, t1, n_steps + 1)

  def step(y, i):
    t = ts[i]
    h = ts[i + 1] - ts[i]
    return y + h * fn(t, y), None

  y, _ = jax.lax.scan(step, y0, jnp.arange(n_steps))
  return y, n_steps
