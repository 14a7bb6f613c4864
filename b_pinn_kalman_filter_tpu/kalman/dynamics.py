"""UKF dynamics and measurement models
(reference: pinn_kalman/ukf_utils.py:24-119).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from b_pinn_kalman_filter_tpu.kalman.patching import patch, unpatch
from b_pinn_kalman_filter_tpu.ops import ns_step

Array = jax.Array

NS_DT = 0.0005 * 5            # reference ukf_utils.py:107
NS_DX = 1.0 / 200             # reference ukf_utils.py:108
PROCESS_NOISE = 1e-8          # reference ukf_utils.py:116


class NSDynamics:
  """Navier–Stokes dynamics on patched (f, u, v, p) states
  (reference NSDynamics, ukf_utils.py:85-119)."""

  def __init__(self, config):
    self.dim = config.kf.patch_size
    self.size = config.data.image_size
    assert self.size % self.dim == 0

  def __call__(self, states: Array) -> Tuple[Array, Array]:
    """states (N, p^2) for all patches jointly -> (next, sqrt_Q)."""
    from b_pinn_kalman_filter_tpu.ops.ns_step_pallas import ns_step_auto

    fields = unpatch(states, self.dim, self.size, 4)   # (B, H, W, 4)
    f = fields[..., 0]
    u = fields[..., 1]
    v = fields[..., 2]
    p = fields[..., 3]

    # Fused Pallas stencil on TPU (5.5x the unfused XLA chain at sigma-point
    # batch sizes); XLA composition elsewhere.
    f, u, v, p = ns_step_auto(f, u, v, p, NS_DT, NS_DX)

    out = jnp.stack([f, u, v, p], axis=-1)
    state = patch(out, self.dim)
    n = self.dim ** 2
    sqrt_q = (jnp.eye(n, dtype=states.dtype)[None]
              * PROCESS_NOISE ** 0.5).repeat(state.shape[0], axis=0)
    return state, sqrt_q


class IdentityKFMeasure:
  """Identity measurement with heteroscedastic covariance from B-PINN
  uncertainty (reference IdentityKFMeasure, ukf_utils.py:24-66).

  Unlike the reference, the measurement function is deterministic (the
  reference injects sampling noise into h itself, ukf_utils.py:43,54-59,
  which double-counts noise already described by R)."""

  def __init__(self, config):
    self.dim = config.kf.patch_size
    self.size = config.data.image_size
    self.var = config.inverse.variance
    self.uncer_flow: Optional[Array] = None
    self.uncer_pres: Optional[Array] = None

  def update_uncertainty(self, uncer_flow: Array, uncer_pres: Array):
    """Per-pixel B-PINN stds (B, H, W, 2) / (B, H, W, 1)
    (reference ukf_utils.py:33-38)."""
    assert uncer_flow.shape[-1] == 2
    assert uncer_pres.shape[-1] == 1
    self.uncer_flow = patch(uncer_flow, self.dim)
    self.uncer_pres = patch(uncer_pres, self.dim)

  def __call__(self, states: Array) -> Tuple[Array, Array]:
    return self.apply(states, self.uncer_flow, self.uncer_pres)

  def apply(self, states: Array, uncer_flow: Optional[Array],
            uncer_pres: Optional[Array]) -> Tuple[Array, Array]:
    """Pure form with the (per-cycle mutable) uncertainties as explicit
    arguments, so a whole filter cycle can be jitted without retracing on
    every ``update_uncertainty``."""
    n = self.dim ** 2
    N = states.shape[0]
    eye = jnp.eye(n, dtype=states.dtype)[None]
    if uncer_flow is None:
      covar = eye.repeat(N, axis=0) * self.var
      return states, covar

    # State ordering is (channel, batch, patch): f-patches first, then u,v
    # (flow), then p (reference ukf_utils.py:52-65).
    quarter = N // 4
    assert uncer_flow.shape[0] == 2 * quarter, (uncer_flow.shape, N)
    assert uncer_pres.shape[0] == quarter
    f_cov = eye.repeat(quarter, axis=0) * self.var
    uv_cov = jax.vmap(jnp.diag)(uncer_flow ** 2)
    p_cov = jax.vmap(jnp.diag)(uncer_pres ** 2)
    covar = jnp.concatenate([f_cov, uv_cov, p_cov], axis=0)
    return states, covar

  def observe(self, rng: Array, f: Array) -> Array:
    """Noisy f-only observation (reference f_only branch,
    ukf_utils.py:40-49): y = f + N(0, var)."""
    return f + jax.random.normal(rng, f.shape) * self.var ** 0.5


class InpaintKFMeasure:
  """Masked measurement (reference InpaintKFMeasure, ukf_utils.py:69-82)."""

  def __init__(self, config, operator=None):
    self.dim = config.kf.patch_size
    self.var = config.inverse.variance
    if operator is None:
      from b_pinn_kalman_filter_tpu.inverse.operators import get_operator
      operator = get_operator(config)
    self.operator = operator

  def __call__(self, states: Array) -> Tuple[Array, Array]:
    return self.apply(states, None, None)

  def apply(self, states: Array, uncer_flow=None,
            uncer_pres=None) -> Tuple[Array, Array]:
    del uncer_flow, uncer_pres  # fixed-covariance measurement
    n = self.dim ** 2
    # Mask patches aligned with state patches.
    mask = patch(jnp.asarray(self.operator.mask)[None], self.dim)  # (N0, p^2)
    reps = states.shape[0] // mask.shape[0]
    mask = jnp.tile(mask, (reps, 1))
    obs = states * mask
    covar = (jnp.eye(n, dtype=states.dtype)[None]
             * self.var).repeat(states.shape[0], axis=0)
    return obs, covar
