"""Golden tests for SDE math against closed forms (SURVEY §4b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from b_pinn_kalman_filter_tpu.core import sde as sde_lib


def _t(vals):
  return jnp.asarray(vals, jnp.float32)


class TestVPSDE:
  sde = sde_lib.VPSDE(beta_min=0.1, beta_max=20, N=1000)

  def test_marginal_closed_form(self):
    t = _t([0.0, 0.25, 0.5, 1.0])
    mean_coef, std = self.sde.marginal_coef(t)
    b0, b1 = 0.1, 20.0
    log_mc = -0.25 * np.asarray(t) ** 2 * (b1 - b0) - 0.5 * np.asarray(t) * b0
    np.testing.assert_allclose(mean_coef, np.exp(log_mc), rtol=1e-5)
    np.testing.assert_allclose(std, np.sqrt(1 - np.exp(2 * log_mc)), rtol=1e-5)

  def test_variance_preserved(self):
    # mean_coef^2 + std^2 == 1 for all t.
    t = _t(np.linspace(1e-3, 1.0, 50))
    mc, std = self.sde.marginal_coef(t)
    np.testing.assert_allclose(mc ** 2 + std ** 2, 1.0, atol=1e-5)

  def test_prior_logp_matches_standard_normal(self):
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3))
    logp = self.sde.prior_logp(z)
    flat = np.asarray(z).reshape(4, -1)
    expected = (-0.5 * flat.shape[1] * np.log(2 * np.pi)
                - 0.5 * (flat ** 2).sum(-1))
    np.testing.assert_allclose(logp, expected, rtol=1e-5)

  def test_sde_drift_diffusion(self):
    x = jnp.ones((2, 4, 4, 1))
    t = _t([0.5, 0.5])
    drift, diffusion = self.sde.sde(x, t)
    beta_t = 0.1 + 0.5 * (20 - 0.1)
    np.testing.assert_allclose(drift, -0.5 * beta_t * np.ones((2, 4, 4, 1)),
                               rtol=1e-5)
    np.testing.assert_allclose(diffusion, np.sqrt(beta_t) * np.ones(2), rtol=1e-5)

  def test_ddpm_discretize(self):
    x = jnp.ones((2, 4, 4, 1))
    t = _t([0.5, 1.0])
    f, G = self.sde.discretize(x, t)
    idx = (np.asarray(t) * 999).astype(int)
    betas = np.linspace(0.1 / 1000, 20 / 1000, 1000)
    np.testing.assert_allclose(
        f, (np.sqrt(1 - betas[idx]) - 1)[:, None, None, None] *
        np.ones((2, 4, 4, 1)), rtol=1e-4)
    np.testing.assert_allclose(G, np.sqrt(betas[idx]), rtol=1e-5)


class TestVESDE:
  sde = sde_lib.VESDE(sigma_min=0.01, sigma_max=50, N=1000)

  def test_marginal_geometric(self):
    t = _t([0.0, 0.5, 1.0])
    _, std = self.sde.marginal_coef(t)
    np.testing.assert_allclose(std, 0.01 * (50 / 0.01) ** np.asarray(t),
                               rtol=1e-5)

  def test_mean_is_identity(self):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 1))
    mean, _ = self.sde.marginal_prob(x, _t([0.3, 0.7]))
    np.testing.assert_allclose(mean, x)

  def test_prior_std(self):
    z = self.sde.prior_sampling(jax.random.PRNGKey(2), (2000, 4))
    assert abs(float(jnp.std(z)) - 50.0) < 2.0

  def test_smld_discretize_matches_sigma_diff(self):
    x = jnp.zeros((2, 4, 4, 1))
    t = _t([0.5, 1.0])
    f, G = self.sde.discretize(x, t)
    sigmas = np.exp(np.linspace(np.log(0.01), np.log(50), 1000))
    idx = (np.asarray(t) * 999).astype(int)
    expected = np.sqrt(sigmas[idx] ** 2 - sigmas[idx - 1] ** 2)
    np.testing.assert_allclose(G, expected, rtol=1e-4)
    np.testing.assert_allclose(f, 0.0)


class TestSubVPSDE:
  sde = sde_lib.subVPSDE(beta_min=0.1, beta_max=20, N=1000)

  def test_std_is_one_minus_exp(self):
    t = _t([0.25, 0.75])
    _, std = self.sde.marginal_coef(t)
    b0, b1 = 0.1, 20.0
    log_mc = -0.25 * np.asarray(t) ** 2 * (b1 - b0) - 0.5 * np.asarray(t) * b0
    np.testing.assert_allclose(std, 1 - np.exp(2 * log_mc), rtol=1e-5)

  def test_diffusion_subvp_discount(self):
    t = _t([0.5])
    _, diff = self.sde.coefficient(t)
    b0, b1 = 0.1, 20.0
    beta_t = b0 + 0.5 * (b1 - b0)
    discount = 1 - np.exp(-2 * b0 * 0.5 - (b1 - b0) * 0.25)
    np.testing.assert_allclose(diff, np.sqrt(beta_t * discount), rtol=1e-5)


class TestReverseSDE:

  def test_reverse_drift_reduces_by_score_term(self):
    fwd = sde_lib.VPSDE(N=100)
    score = lambda x, t: -x  # score of N(0, I)
    rsde = fwd.reverse(score, probability_flow=False)
    x = jnp.ones((2, 4, 4, 1))
    t = _t([0.5, 0.5])
    f_drift, f_diff = fwd.sde(x, t)
    r_drift, r_diff = rsde.sde(x, t)
    expected = f_drift - f_diff[:, None, None, None] ** 2 * score(x, t)
    np.testing.assert_allclose(r_drift, expected, rtol=1e-5)
    np.testing.assert_allclose(r_diff, f_diff)

  def test_probability_flow_halves_score_and_zeroes_diffusion(self):
    fwd = sde_lib.VPSDE(N=100)
    score = lambda x, t: -x
    ode = fwd.reverse(score, probability_flow=True)
    x = jnp.ones((2, 4, 4, 1))
    t = _t([0.5, 0.5])
    f_drift, f_diff = fwd.sde(x, t)
    o_drift, o_diff = ode.sde(x, t)
    expected = f_drift - 0.5 * f_diff[:, None, None, None] ** 2 * score(x, t)
    np.testing.assert_allclose(o_drift, expected, rtol=1e-5)
    np.testing.assert_allclose(o_diff, 0.0)

  def test_forward_marginal_consistency_monte_carlo(self):
    """Integrating the forward VP SDE matches the closed-form marginal."""
    fwd = sde_lib.VPSDE(N=1000)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.full((4096, 1), 2.0)
    x = x0
    n, T = 200, 1.0
    dt = T / n
    for i in range(n):
      t = jnp.full((x.shape[0],), i * dt + 1e-8)
      drift, diffusion = fwd.sde(x, t)
      rng, step_rng = jax.random.split(rng)
      z = jax.random.normal(step_rng, x.shape)
      x = x + drift * dt + diffusion[:, None] * np.sqrt(dt) * z
    mc, std = fwd.marginal_coef(jnp.asarray([1.0]))
    assert abs(float(jnp.mean(x)) - float(mc[0]) * 2.0) < 0.05
    assert abs(float(jnp.std(x)) - float(std[0])) < 0.05
