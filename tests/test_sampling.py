"""Sampler correctness with analytic scores (SURVEY §4c).

For x0 ~ N(mu0, s0^2 I), the VP-perturbed marginal is
N(a(t) mu0, (a(t)^2 s0^2 + std(t)^2) I) with a known score — so the
reverse samplers must reproduce the data distribution without any
neural network.
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


@pytest.mark.parametrize("predictor,corrector", [
    ('euler_maruyama', 'none'),
    ('reverse_diffusion', 'none'),
    ('ancestral_sampling', 'none'),
    ('reverse_diffusion', 'langevin'),
])
def test_pc_sampler_recovers_gaussian_vp(predictor, corrector):
  sde = sde_lib.VPSDE(N=200)
  sampler = sampling.get_pc_sampler_from_score(
      sde, SHAPE, sampling.get_predictor(predictor),
      sampling.get_corrector(corrector), inverse_scaler=lambda x: x,
      snr=0.16, n_steps=1, denoise=True, eps=1e-3)
  samples, nfe = jax.jit(sampler, static_argnums=1)(
      jax.random.PRNGKey(0), analytic_vp_score(sde))
  assert nfe == 200 * 2
  assert abs(float(jnp.mean(samples)) - MU0) < 0.1
  assert abs(float(jnp.std(samples)) - S0) < 0.1


def test_pc_sampler_recovers_gaussian_ve():
  sde = sde_lib.VESDE(sigma_min=0.01, sigma_max=20, N=300)
  sampler = sampling.get_pc_sampler_from_score(
      sde, SHAPE, sampling.get_predictor('reverse_diffusion'),
      sampling.get_corrector('langevin'), inverse_scaler=lambda x: x,
      snr=0.16, n_steps=1, denoise=True, eps=1e-5)
  samples, _ = jax.jit(sampler, static_argnums=1)(
      jax.random.PRNGKey(1), analytic_ve_score(sde))
  assert abs(float(jnp.mean(samples)) - MU0) < 0.15
  assert abs(float(jnp.std(samples)) - S0) < 0.15


def test_probability_flow_ode_recovers_gaussian():
  """Dopri45 integration of the probability-flow ODE with analytic score."""
  sde = sde_lib.VPSDE(N=1000)
  score_fn = analytic_vp_score(sde)

  def drift(t, x):
    vec_t = jnp.full((x.shape[0],), t)
    rsde = sde.reverse(score_fn, probability_flow=True)
    return rsde.sde(x, vec_t)[0]

  rng = jax.random.PRNGKey(2)
  x_T = sde.prior_sampling(rng, SHAPE)
  result = jax.jit(lambda y: ode_lib.odeint_dopri(drift, y, 1.0, 1e-3,
                                                  rtol=1e-4, atol=1e-4))(x_T)
  assert int(result.status) == 0
  samples = result.y
  assert abs(float(jnp.mean(samples)) - MU0) < 0.05
  assert abs(float(jnp.std(samples)) - S0) < 0.05


def test_ode_dopri_vs_exact_linear():
  """dy/dt = -y integrates to y0*exp(-T) within tolerance."""
  y0 = jnp.ones((4, 4)) * 3.0
  res = ode_lib.odeint_dopri(lambda t, y: -y, y0, 0.0, 2.0,
                             rtol=1e-7, atol=1e-9)
  np.testing.assert_allclose(res.y, 3.0 * np.exp(-2.0), rtol=1e-6)
  assert int(res.status) == 0


def test_ode_rk4_fixed_grid():
  y0 = jnp.asarray([1.0])
  y, nfe = ode_lib.odeint_rk4(lambda t, y: y, y0, 0.0, 1.0, 100)
  np.testing.assert_allclose(y, np.e, rtol=1e-6)
  assert nfe == 400


def test_pc_chunked_sampler_matches_single_scan():
  """get_pc_chunked_sampler is the SAME program as get_pc_sampler, split
  into bounded device dispatches (sampling.pc_chunks): same rng splits,
  same timestep grid, same step order — outputs must match bit-for-bit."""
  from b_pinn_kalman_filter_tpu.models import registry as mutils
  from tests.tiny_configs import tiny_ddpm_config

  config = tiny_ddpm_config()
  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  sde = sde_lib.VPSDE(N=20)
  shape = (2, config.data.image_size, config.data.image_size,
           config.data.num_channels)
  kwargs = dict(
      sde=sde, model=model, shape=shape,
      predictor=sampling.get_predictor('reverse_diffusion'),
      corrector=sampling.get_corrector('langevin'),
      inverse_scaler=lambda x: x, snr=0.16, n_steps=1,
      probability_flow=False, continuous=True, denoise=True, eps=1e-3)
  single = jax.jit(sampling.get_pc_sampler(**kwargs))
  chunked = sampling.get_pc_chunked_sampler(**kwargs, num_chunks=4)
  rng = jax.random.PRNGKey(7)
  ref, nfe_ref = single(rng, variables['params'])
  out, nfe = chunked(rng, variables['params'])
  assert int(nfe) == int(nfe_ref) == 40
  np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
  with pytest.raises(ValueError):
    sampling.get_pc_chunked_sampler(**kwargs, num_chunks=3)


def test_pc_chunks_config_dispatch():
  """sampling.pc_chunks > 1 routes get_sampling_fn to the chunked sampler."""
  from b_pinn_kalman_filter_tpu.models import registry as mutils
  from tests.tiny_configs import tiny_mlp_config

  config = tiny_mlp_config()
  config.sampling.pc_chunks = 5
  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  sde, eps = sde_lib.get_sde(config)
  shape = (2, config.data.image_size, config.data.image_size,
           config.data.num_channels)
  fn = sampling.get_sampling_fn(config, sde, model, shape, lambda x: x, eps)
  samples, nfe = fn(jax.random.PRNGKey(3), variables['params'])
  assert samples.shape == shape
  assert np.isfinite(np.asarray(samples)).all()
