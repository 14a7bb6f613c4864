"""Observation SDEs for linear inverse problems
(reference: sde_lib.py OBSVSDE :122-133, LOBSVSDE :310-359).

The reference keeps these in sde_lib; they live here so the core SDE module
has no dependency on operators.  LOBSVSDE in the reference is partially
stubbed (sde/coefficient/marginal_coef ``pass``, :352-359) — only
``observe_sampling`` is exercised by the conditional samplers, and that is
what is implemented faithfully.
"""

from __future__ import annotations

import abc
from typing import Optional

import jax
import jax.numpy as jnp

from b_pinn_kalman_filter_tpu.core import sde as sde_lib
from b_pinn_kalman_filter_tpu.inverse.operators import LinearOperator


class OBSVSDE(abc.ABC):
  """Observation-SDE base (reference sde_lib.py:122-133)."""

  def __init__(self, N: int, y0, operator: LinearOperator):
    self.N = N
    self.y0 = y0
    self.operator = operator

  @abc.abstractmethod
  def observe_sampling(self, z, t):
    """Sample the observation process y_t given latent noise z."""


class LOBSVSDE(OBSVSDE):
  """Linear-observation SDE (reference sde_lib.py:310-350).

  y_t = alpha(t) y_0 + beta(t) A z, with (alpha, beta) the state SDE's
  marginal coefficients and A the linear operator.
  """

  def __init__(self, state_sde: sde_lib.SDE, y0, operator: LinearOperator):
    super().__init__(state_sde.N, y0, operator)
    self.state_sde = state_sde

  @property
  def T(self):
    return 1.0

  def marginal_prob(self, z, t):
    alpha, beta = self.state_sde.marginal_coef(t)
    mean = alpha[:, None, None] * self.y0
    return mean, beta

  def observe_sampling(self, z, t):
    """y_t sample (reference sde_lib.py:338-340): shape (B, C, D)."""
    alpha, beta = self.state_sde.marginal_coef(t)
    return (alpha[:, None, None] * self.y0
            + beta[:, None, None] * self.operator(z, keep_shape=False))


def get_obsvsde(config, y0, operator: LinearOperator):
  """Build the observation SDE (reference inverse/inverse_lib.py:24-34)."""
  sde, sampling_eps = sde_lib.get_sde(config)
  if config.inverse.sampler in ('controlled', 'dps'):
    return LOBSVSDE(sde, y0, operator), sampling_eps
  raise NotImplementedError
