"""Likelihood (bits/dim) correctness with analytic scores.

With the exact score of a Gaussian data distribution, the probability-flow
ODE likelihood must equal the closed-form Gaussian log-density.
"""

import jax
import jax.numpy as jnp
import numpy as np

from b_pinn_kalman_filter_tpu.core import likelihood, sde as sde_lib

MU0, S0 = 0.3, 0.4


def analytic_vp_score(sde):
  def score_fn(x, t, rng=None):
    a, std = sde.marginal_coef(t)
    var = a ** 2 * S0 ** 2 + std ** 2
    return -(x - (a * MU0)[:, None, None, None]) / var[:, None, None, None]
  return score_fn


def test_bpd_matches_gaussian_closed_form():
  sde = sde_lib.VPSDE(N=1000)
  inverse_scaler = lambda x: x
  # The analytic Gaussian score has a DIAGONAL Jacobian, so the Rademacher
  # Hutchinson estimate is exact for every draw (eps_i^2 = 1).
  fn = likelihood.get_likelihood_fn_from_score(
      sde, inverse_scaler, hutchinson_type='Rademacher',
      rtol=1e-6, atol=1e-6, eps=1e-5)

  data = MU0 + S0 * jax.random.normal(jax.random.PRNGKey(1), (4, 4, 4, 1))
  bpd, z, nfe = jax.jit(fn, static_argnums=1)(
      jax.random.PRNGKey(0), analytic_vp_score(sde), data)
  bpd = np.asarray(bpd)

  N = np.prod(data.shape[1:])
  flat = np.asarray(data).reshape(data.shape[0], -1)
  logp = (-0.5 * N * np.log(2 * np.pi * S0 ** 2)
          - 0.5 * ((flat - MU0) ** 2).sum(-1) / S0 ** 2)
  expected_bpd = -logp / np.log(2) / N + (7.0 - inverse_scaler(-1.0))
  np.testing.assert_allclose(bpd, expected_bpd, rtol=0, atol=0.05)
  assert int(nfe) > 0


def test_divergence_estimator_exact_for_linear_fn():
  """For f(x) = A x the Hutchinson estimate with a single Rademacher eps is
  eps^T A eps; averaged over draws it converges to tr(A)."""
  A = jnp.asarray(np.random.default_rng(0).random((6, 6)), jnp.float32)
  f = lambda x, t: (x.reshape(x.shape[0], -1) @ A.T).reshape(x.shape)
  div_fn = likelihood.get_div_fn(f)
  x = jnp.zeros((2, 2, 3, 1))
  vals = []
  for i in range(400):
    eps = jax.random.rademacher(jax.random.PRNGKey(i), x.shape, dtype=x.dtype)
    vals.append(np.asarray(div_fn(x, None, eps)))
  est = np.mean(vals)
  np.testing.assert_allclose(est, np.trace(A), rtol=0.1)
