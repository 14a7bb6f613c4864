"""DPM-Solver++ fast-sampler correctness (beyond-parity; PAPERS.md).

Analytic-score checks mirroring test_sampling.py: with x0 ~ N(mu0, s0^2 I)
the true score of every marginal is known, so the solver must (a) recover
the data distribution in ~20 NFE (the PC sampler needs 1000+), and (b)
agree with the Dormand-Prince probability-flow ODE solution from the SAME
prior draw — both approximate the same deterministic ODE map.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from b_pinn_kalman_filter_tpu.core import ode as ode_lib
from b_pinn_kalman_filter_tpu.core import sampling
from b_pinn_kalman_filter_tpu.core import sde as sde_lib

MU0, S0 = 1.5, 0.5
SHAPE = (2048, 2, 2, 1)


def analytic_vp_score(sde):
  def score_fn(x, t, rng=None):
    a, std = sde.marginal_coef(t)
    var = a ** 2 * S0 ** 2 + std ** 2
    return -(x - (a * MU0)[:, None, None, None]) / var[:, None, None, None]
  return score_fn


def analytic_ve_score(sde):
  def score_fn(x, t, rng=None):
    _, std = sde.marginal_coef(t)
    var = S0 ** 2 + std ** 2
    return -(x - MU0) / var[:, None, None, None]
  return score_fn


def test_dpm_solver_recovers_gaussian_vp_20_nfe():
  sde = sde_lib.VPSDE(N=1000)
  sampler = sampling.get_dpm_solver_sampler_from_score(
      sde, SHAPE, inverse_scaler=lambda x: x, steps=20, order=2,
      denoise=True, eps=1e-3)
  samples, nfe = jax.jit(sampler, static_argnums=1)(
      jax.random.PRNGKey(0), analytic_vp_score(sde))
  assert nfe == 21  # 20 steps + final Tweedie denoise
  assert abs(float(jnp.mean(samples)) - MU0) < 0.05
  assert abs(float(jnp.std(samples)) - S0) < 0.05


def test_dpm_solver_recovers_gaussian_subvp():
  sde = sde_lib.subVPSDE(N=1000)
  sampler = sampling.get_dpm_solver_sampler_from_score(
      sde, SHAPE, inverse_scaler=lambda x: x, steps=25, order=2,
      denoise=True, eps=1e-3)
  samples, _ = jax.jit(sampler, static_argnums=1)(
      jax.random.PRNGKey(1), analytic_vp_score(sde))
  assert abs(float(jnp.mean(samples)) - MU0) < 0.1
  assert abs(float(jnp.std(samples)) - S0) < 0.1


def test_dpm_solver_recovers_gaussian_ve():
  sde = sde_lib.VESDE(sigma_min=0.01, sigma_max=20, N=1000)
  sampler = sampling.get_dpm_solver_sampler_from_score(
      sde, SHAPE, inverse_scaler=lambda x: x, steps=25, order=2,
      denoise=True, eps=1e-5)
  samples, _ = jax.jit(sampler, static_argnums=1)(
      jax.random.PRNGKey(2), analytic_ve_score(sde))
  assert abs(float(jnp.mean(samples)) - MU0) < 0.1
  assert abs(float(jnp.std(samples)) - S0) < 0.1


def _ode_reference(sde, score_fn, z, eps):
  def drift(t, x):
    vec_t = jnp.full((x.shape[0],), t)
    rsde = sde.reverse(score_fn, probability_flow=True)
    return rsde.sde(x, vec_t)[0]
  result = ode_lib.odeint_dopri(drift, z, sde.T, eps, rtol=1e-7, atol=1e-7)
  return result.y


def test_dpm_solver_matches_probability_flow_ode():
  """From the SAME prior draw, the 30-step solver must land where the
  tightly-tolerated Dopri integration of the probability-flow ODE lands."""
  sde = sde_lib.VPSDE(N=1000)
  score_fn = analytic_vp_score(sde)
  shape = (256, 2, 2, 1)
  z = sde.prior_sampling(jax.random.PRNGKey(3), shape)
  x_ref = _ode_reference(sde, score_fn, z, eps=1e-3)

  sampler = sampling.get_dpm_solver_sampler_from_score(
      sde, shape, inverse_scaler=lambda x: x, steps=30, order=2,
      denoise=False, eps=1e-3)
  x_dpm, nfe = sampler(jax.random.PRNGKey(99), score_fn, z=z)
  assert nfe == 30
  err = float(jnp.max(jnp.abs(x_dpm - x_ref)))
  assert err < 0.05, err


def test_dpm_solver_order2_beats_order1():
  """Multistep correction must reduce error vs the ODE reference at the
  same NFE (the convergence-order sanity check)."""
  sde = sde_lib.VPSDE(N=1000)
  score_fn = analytic_vp_score(sde)
  shape = (128, 2, 2, 1)
  z = sde.prior_sampling(jax.random.PRNGKey(4), shape)
  x_ref = _ode_reference(sde, score_fn, z, eps=1e-3)

  errs = {}
  for order in (1, 2):
    sampler = sampling.get_dpm_solver_sampler_from_score(
        sde, shape, inverse_scaler=lambda x: x, steps=10, order=order,
        denoise=False, eps=1e-3)
    x, _ = sampler(jax.random.PRNGKey(0), score_fn, z=z)
    errs[order] = float(jnp.mean(jnp.abs(x - x_ref)))
  assert errs[2] < errs[1], errs


def test_dpm_solver_config_dispatch():
  """`sampling.method='dpm_solver'` reaches the solver through
  get_sampling_fn with a real (tiny MLP) score model."""
  from tests.tiny_configs import tiny_mlp_config
  from b_pinn_kalman_filter_tpu import models as mutils
  from b_pinn_kalman_filter_tpu.data import get_data_inverse_scaler

  config = tiny_mlp_config()
  config.sampling.method = 'dpm_solver'
  config.sampling.dpm_steps = 6
  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  sde, eps = sde_lib.get_sde(config)
  shape = (4, config.data.image_size, config.data.image_size,
           config.data.num_channels)
  fn = jax.jit(sampling.get_sampling_fn(
      config, sde, model, shape, get_data_inverse_scaler(config), eps))
  samples, nfe = fn(jax.random.PRNGKey(1), variables['params'])
  assert samples.shape == shape
  assert int(nfe) == 7
  assert np.isfinite(np.asarray(samples)).all()


def test_dpm_solver_time_skip_and_order1_run():
  sde = sde_lib.VPSDE(N=1000)
  sampler = sampling.get_dpm_solver_sampler_from_score(
      sde, (64, 2, 2, 1), inverse_scaler=lambda x: x, steps=40, order=1,
      skip_type='time', denoise=True, eps=1e-3)
  samples, _ = sampler(jax.random.PRNGKey(5), analytic_vp_score(sde))
  assert abs(float(jnp.mean(samples)) - MU0) < 0.2


def test_dpm_solver_rejects_bad_params():
  sde = sde_lib.VPSDE(N=1000)
  with pytest.raises(ValueError):
    sampling.get_dpm_solver_sampler_from_score(
        sde, SHAPE, lambda x: x, steps=10, order=3)
  with pytest.raises(ValueError):
    sampling.get_dpm_solver_sampler_from_score(
        sde, SHAPE, lambda x: x, steps=0)
  with pytest.raises(ValueError):
    sampling.get_dpm_solver_sampler_from_score(
        sde, SHAPE, lambda x: x, skip_type='quadratic')
