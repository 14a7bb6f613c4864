"""Inverse-problem suite tests: operators, observation SDE, DPS/controlled
samplers with analytic scores, PC inpainter/colorizer."""

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

from b_pinn_kalman_filter_tpu.core import sampling, sde as sde_lib
from b_pinn_kalman_filter_tpu.core import controllable
from b_pinn_kalman_filter_tpu.inverse import (
    GaussianFilter, InpaintOperator, LOBSVSDE, ScalerMult)
from b_pinn_kalman_filter_tpu.inverse import conditional_sampling


class _FixedMaskSource:
  def __init__(self, mask):
    self._mask = mask

  def next(self):
    return self._mask


def _checkerboard(h, w):
  m = (np.indices((h, w)).sum(axis=0) % 2).astype(np.float32)
  return m[..., None]


class TestOperators:

  def test_inpaint_keep_shape(self):
    mask = _checkerboard(4, 4)
    op = InpaintOperator(mask_source=_FixedMaskSource(mask))
    x = jnp.ones((2, 4, 4, 3))
    out = op(x, keep_shape=True)
    np.testing.assert_allclose(out, mask[None] * np.ones((2, 4, 4, 3)))
    inv = op(x, keep_shape=True, invert=True)
    np.testing.assert_allclose(np.asarray(out + inv), 1.0)

  def test_inpaint_flat_matches_matrix(self):
    mask = _checkerboard(4, 4)
    op = InpaintOperator(mask_source=_FixedMaskSource(mask))
    x = jnp.asarray(np.random.default_rng(0).random((1, 4, 4, 1)), jnp.float32)
    flat = op(x, keep_shape=False)      # (1, 1, 16) zero-padded
    A = op.to_matrix((4, 4))
    expected = A @ np.asarray(x).reshape(-1)
    np.testing.assert_allclose(np.asarray(flat).reshape(-1), expected,
                               rtol=1e-6)

  def test_inpaint_decompose_identity(self):
    """A == pL @ pL^T A (projection property of the decomposition)."""
    mask = _checkerboard(4, 4)
    op = InpaintOperator(mask_source=_FixedMaskSource(mask))
    A, pL, T = op.decompose((4, 4))
    np.testing.assert_allclose(pL @ pL.T, A, atol=1e-6)

  def test_project_observed_roundtrip(self):
    mask = _checkerboard(4, 4)
    op = InpaintOperator(mask_source=_FixedMaskSource(mask))
    x = jnp.asarray(np.random.default_rng(1).random((2, 4, 4, 1)), jnp.float32)
    y = op(x, keep_shape=False)
    back = op.project_observed(y, (4, 4))
    np.testing.assert_allclose(back, op(x, keep_shape=True), rtol=1e-6)

  def test_gaussian_filter_matches_scipy(self):
    from scipy import signal
    op = GaussianFilter(shape=(3, 3), std=3)
    x = np.random.default_rng(2).random((8, 8)).astype(np.float32)
    expected = signal.convolve2d(x, op.get_kernel(), boundary='symm',
                                 mode='same')
    got = op(jnp.asarray(x))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

  def test_gaussian_filter_matrix_matches_valid_conv(self):
    from scipy import signal
    op = GaussianFilter(shape=(3, 3), std=3)
    x = np.random.default_rng(3).random((8, 8)).astype(np.float32)
    mat = op.to_matrix((8, 8))
    got = (mat @ x.flatten()).reshape(6, 6)
    expected = signal.convolve2d(x, op.get_kernel(), mode='valid')
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-5)

  def test_scaler_mult(self):
    op = ScalerMult(2.5)
    x = jnp.ones((2, 3))
    np.testing.assert_allclose(op(x), 2.5)

  def test_factory_blur_branch(self):
    # get_operator 'blur' extension (reference leaves GaussianFilter
    # unreachable from its factory, operators.py:8-17).
    import ml_collections
    from b_pinn_kalman_filter_tpu.inverse.operators import get_operator
    config = ml_collections.ConfigDict()
    config.inverse = ml_collections.ConfigDict()
    config.inverse.operator = 'blur'
    config.inverse.blur_kernel = 5
    config.inverse.blur_std = 1.5
    op = get_operator(config)
    assert isinstance(op, GaussianFilter)
    assert op.get_kernel().shape == (5, 5)
    x = jnp.asarray(np.random.default_rng(4).random((2, 8, 8, 1)), jnp.float32)
    y = op(x)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


MU0, S0 = 0.8, 0.3


def _analytic_score(sde):
  def score_fn(x, t, rng=None):
    a, std = sde.marginal_coef(t)
    var = a ** 2 * S0 ** 2 + std ** 2
    return -(x - (a * MU0)[:, None, None, None]) / var[:, None, None, None]
  return score_fn


class _FakeModelWrapper:
  """Duck-types the (model, params) pair for mutils.get_score_fn by
  monkeypatching: tests pass an explicit score instead."""


def _make_config(solver='RK45', sampler='dps', variance=0.01):
  config = ml_collections.ConfigDict()
  config.inverse = ml_collections.ConfigDict()
  config.inverse.solver = solver
  config.inverse.sampler = sampler
  config.inverse.variance = variance
  return config


def test_lobsvsde_observe_sampling_shapes():
  mask = _checkerboard(4, 4)
  op = InpaintOperator(mask_source=_FixedMaskSource(mask))
  state_sde = sde_lib.VPSDE(N=100)
  x0 = jnp.full((3, 4, 4, 1), MU0)
  y0 = op(x0, keep_shape=False)
  obsv = LOBSVSDE(state_sde, y0, op)
  z = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
  t = jnp.asarray([0.1, 0.5, 0.9])
  yt = obsv.observe_sampling(z, t)
  assert yt.shape == y0.shape
  # At t->0, y_t -> y_0.
  yt0 = obsv.observe_sampling(z, jnp.full((3,), 1e-5))
  np.testing.assert_allclose(yt0, y0, atol=1e-2)


def test_dps_recovers_observed_pixels(monkeypatch):
  """DPS with the analytic score must reproduce observed pixels closely."""
  from b_pinn_kalman_filter_tpu.models import registry

  sde = sde_lib.VPSDE(N=100)
  score = _analytic_score(sde)
  monkeypatch.setattr(registry, 'get_score_fn',
                      lambda *a, **k: score)

  mask = _checkerboard(6, 6)
  op = InpaintOperator(mask_source=_FixedMaskSource(mask))
  rng = jax.random.PRNGKey(0)
  origin = MU0 + S0 * jax.random.normal(rng, (8, 6, 6, 1))
  y0 = op(origin, keep_shape=False)
  obsv = LOBSVSDE(sde, y0, op)

  # variance matches the reference inpaint_dps config (0.1); smaller values
  # make the DPS field prohibitively stiff for the ODE solver.
  config = _make_config(solver='RK45', sampler='dps', variance=0.1)
  sampler = conditional_sampling.get_dps_sampler(config, obsv, origin.shape,
                                                 eps=1e-3)
  samples = jax.jit(lambda r: sampler(r, None, None))(jax.random.PRNGKey(1))
  assert np.isfinite(np.asarray(samples)).all()
  # Observed pixels should be pulled toward the observation: an
  # unconditional sample has E|x - origin| = 2*S0/sqrt(pi) ~ 0.34 on
  # observed pixels; DPS must beat that.
  m = np.asarray(mask)[None]
  B = samples.shape[0]
  obs_err = np.abs(np.asarray(samples - origin) * m).sum() / (m.sum() * B)
  assert obs_err < 0.28, obs_err


def test_dps_dpm_recovers_observed_pixels(monkeypatch):
  """The guided DPM-Solver fast path ('dpm') must pull observed pixels
  toward the observation like the RK45 path — at ~50 model evals instead
  of the adaptive solver's thousands of RHS evals."""
  from b_pinn_kalman_filter_tpu.models import registry

  sde = sde_lib.VPSDE(N=100)
  monkeypatch.setattr(registry, 'get_score_fn',
                      lambda *a, **k: _analytic_score(sde))

  mask = _checkerboard(6, 6)
  op = InpaintOperator(mask_source=_FixedMaskSource(mask))
  rng = jax.random.PRNGKey(0)
  origin = MU0 + S0 * jax.random.normal(rng, (8, 6, 6, 1))
  y0 = op(origin, keep_shape=False)
  obsv = LOBSVSDE(sde, y0, op)

  config = _make_config(solver='dpm', sampler='dps', variance=0.1)
  config.inverse.dpm_steps = 50
  sampler = conditional_sampling.get_dps_sampler(config, obsv, origin.shape,
                                                 eps=1e-3)
  samples = jax.jit(lambda r: sampler(r, None, None))(jax.random.PRNGKey(1))
  assert np.isfinite(np.asarray(samples)).all()
  m = np.asarray(mask)[None]
  B = samples.shape[0]
  obs_err = np.abs(np.asarray(samples - origin) * m).sum() / (m.sum() * B)
  assert obs_err < 0.28, obs_err


def test_dps_dpm_matches_rk45_trajectory(monkeypatch):
  """'dpm' integrates the SAME conditional probability-flow ODE as 'RK45'
  (the guidance is folded into an effective data prediction, not a new
  approximation): from an identical prior draw + observation noise the two
  posterior samples must agree closely.

  Tolerances reflect the RK45 path's OWN integration error at its
  production rtol=atol=1e-3: against a converged tol=1e-5 Dormand-Prince
  reference of this exact problem (2026-08-19 calibration), RK45@1e-3 is
  0.036 mean / 0.22 max away while dpm@80 is 0.011 / 0.062 — the 81-eval
  multistep solve is ~3x MORE accurate than the ~15k-NFE adaptive path,
  so their mutual distance is dominated by RK45's error."""
  from b_pinn_kalman_filter_tpu.models import registry

  sde = sde_lib.VPSDE(N=100)
  monkeypatch.setattr(registry, 'get_score_fn',
                      lambda *a, **k: _analytic_score(sde))

  mask = _checkerboard(6, 6)
  op = InpaintOperator(mask_source=_FixedMaskSource(mask))
  origin = MU0 + S0 * jax.random.normal(jax.random.PRNGKey(0), (4, 6, 6, 1))
  obsv = LOBSVSDE(sde, op(origin, keep_shape=False), op)
  z = sde.prior_sampling(jax.random.PRNGKey(7), origin.shape)

  outs = {}
  for solver in ('RK45', 'dpm'):
    config = _make_config(solver=solver, sampler='dps', variance=0.1)
    config.inverse.dpm_steps = 80
    sampler = conditional_sampling.get_dps_sampler(config, obsv, origin.shape,
                                                   eps=1e-3)
    # Same rng => same observation noise; same z => same start point.
    outs[solver] = np.asarray(sampler(jax.random.PRNGKey(3), None, None, z=z))
  diff = np.abs(outs['RK45'] - outs['dpm'])
  assert diff.mean() < 0.06, diff.mean()
  assert diff.max() < 0.3, diff.max()


def test_solver_dispatch_case_and_fixed_steps(monkeypatch):
  """'rk45' lowercase must dispatch like 'RK45' (a case mismatch silently
  cost a chip run, advisor round 3), and the 'fixed' solver must honor the
  optional TPU-config `fixed_steps` knob (default: the reference's 5000)."""
  from b_pinn_kalman_filter_tpu.models import registry
  sde = sde_lib.VPSDE(N=100)
  monkeypatch.setattr(registry, 'get_score_fn',
                      lambda *a, **k: _analytic_score(sde))
  mask = _checkerboard(4, 4)
  op = InpaintOperator(mask_source=_FixedMaskSource(mask))
  origin = jnp.full((2, 4, 4, 1), MU0)
  obsv = LOBSVSDE(sde, op(origin, keep_shape=False), op)

  config = _make_config(solver='rk45', sampler='dps', variance=0.1)
  sampler = conditional_sampling.get_dps_sampler(config, obsv, origin.shape,
                                                 eps=1e-3)
  out = sampler(jax.random.PRNGKey(0), None, None)
  assert np.isfinite(np.asarray(out)).all()

  config = _make_config(solver='fixed', sampler='dps', variance=0.1)
  config.inverse.fixed_steps = 20
  sampler = conditional_sampling.get_dps_sampler(config, obsv, origin.shape,
                                                 eps=1e-3)
  out = sampler(jax.random.PRNGKey(0), None, None)
  assert out.shape == origin.shape
  assert np.isfinite(np.asarray(out)).all()


def test_fixed_solver_dt_scales_with_steps():
  """The reference's 'fixed' Euler quirk: dt=-2e-5 is NOT the grid spacing,
  so 5000 steps integrate exactly 0.1 time-units of drift.  The TPU-config
  `fixed_steps` knob must change RESOLUTION only: any step count still
  integrates the same 0.1 total (a truncated integral was the round-4
  review finding), and 'Fixed'/'FIXED' must dispatch like 'fixed'."""
  x0 = jnp.ones((2, 3))

  def const_field(t, x):
    return jnp.ones_like(x)  # d(total)/dstep = dt exactly, grid-independent

  for solver, steps in (('fixed', 5000), ('Fixed', 500), ('FIXED', 20)):
    config = _make_config(solver=solver, sampler='dps')
    config.inverse.fixed_steps = steps
    out = conditional_sampling._solve(config, const_field, x0, 1.0, 1e-3)
    # rtol covers f32 accumulation over up to 5000 adds (~1.5e-4 observed);
    # a truncated integral would be off by (5000-steps)/5000, e.g. 90%.
    np.testing.assert_allclose(np.asarray(out), 1.0 - 0.1, rtol=1e-3)


def test_controlled_sampler_runs(monkeypatch):
  from b_pinn_kalman_filter_tpu.models import registry
  sde = sde_lib.VPSDE(N=100)
  score = _analytic_score(sde)
  monkeypatch.setattr(registry, 'get_score_fn', lambda *a, **k: score)

  mask = _checkerboard(6, 6)
  op = InpaintOperator(mask_source=_FixedMaskSource(mask))
  origin = jnp.full((4, 6, 6, 1), MU0)
  y0 = op(origin, keep_shape=False)
  obsv = LOBSVSDE(sde, y0, op)
  config = _make_config(solver='RK45', sampler='controlled')
  sampler = conditional_sampling.get_controlled_sampler(
      config, obsv, origin.shape, lambda t: (1.0 - t) * 0.8, eps=1e-3)
  samples = sampler(jax.random.PRNGKey(0), None, None)
  assert samples.shape == origin.shape
  assert np.isfinite(np.asarray(samples)).all()


def test_controlled_dpm_matches_rk45_error_profile(monkeypatch):
  """The controlled sampler's 'dpm' fast path must reproduce the RK45
  path's error profile on independent draws (~50 model evals instead of
  the adaptive solver's RHS-eval count).

  NOTE (reference quirk, preserved): the controlled sampler's
  observed-region error is LARGE by reference design — the returned state
  is the raw ODE state; the projection only steers the drift's
  *evaluation point* and is never applied to the returned sample
  (reference conditional_sampling.py:76-96 returns the solver state, not
  optimize_fn(x)).  Measured here (analytic score, 50%% checkerboard,
  2026-08-19): obs |err| ~0.69 for BOTH RK45 and dpm vs the 0.34 an
  unconditional draw would give.  What the fast path must match is the
  RK45 path's behavior, not absolute recovery."""
  from b_pinn_kalman_filter_tpu.models import registry
  sde = sde_lib.VPSDE(N=100)
  monkeypatch.setattr(registry, 'get_score_fn',
                      lambda *a, **k: _analytic_score(sde))

  mask = _checkerboard(6, 6)
  op = InpaintOperator(mask_source=_FixedMaskSource(mask))
  origin = MU0 + S0 * jax.random.normal(jax.random.PRNGKey(0), (8, 6, 6, 1))
  obsv = LOBSVSDE(sde, op(origin, keep_shape=False), op)
  m = np.asarray(mask)[None]
  B = origin.shape[0]

  errs = {}
  for solver in ('RK45', 'dpm'):
    config = _make_config(solver=solver, sampler='controlled')
    config.inverse.dpm_steps = 50
    sampler = conditional_sampling.get_controlled_sampler(
        config, obsv, origin.shape, lambda t: (1.0 - t) * 0.8, eps=1e-3)
    out = np.asarray(
        jax.jit(lambda r: sampler(r, None, None))(jax.random.PRNGKey(1)))
    assert np.isfinite(out).all()
    err = np.abs(out - origin)
    errs[solver] = ((err * m).sum() / (m.sum() * B),
                    (err * (1 - m)).sum() / ((1 - m).sum() * B))
  # Same key => same prior draw + per-t re-noising: profiles must agree.
  assert abs(errs['dpm'][0] - errs['RK45'][0]) < 0.05, errs
  assert abs(errs['dpm'][1] - errs['RK45'][1]) < 0.05, errs


def test_controlled_dpm_matches_rk45_trajectory(monkeypatch):
  """'dpm' integrates the SAME controlled probability-flow ODE as 'RK45'
  (the projection is folded into an effective data prediction via the
  exact drift-difference rewrite, not a new approximation): from an
  identical prior draw the two posterior samples must agree closely.
  Both paths derive the per-t re-noising key the same way (fold_in of
  t*1e6), so the integrated field is the same function of t; the residual
  difference is integration error plus the different noise-refresh node
  sets."""
  from b_pinn_kalman_filter_tpu.models import registry
  sde = sde_lib.VPSDE(N=100)
  monkeypatch.setattr(registry, 'get_score_fn',
                      lambda *a, **k: _analytic_score(sde))

  mask = _checkerboard(6, 6)
  op = InpaintOperator(mask_source=_FixedMaskSource(mask))
  origin = MU0 + S0 * jax.random.normal(jax.random.PRNGKey(0), (4, 6, 6, 1))
  obsv = LOBSVSDE(sde, op(origin, keep_shape=False), op)
  z = sde.prior_sampling(jax.random.PRNGKey(7), origin.shape)

  outs = {}
  for solver in ('RK45', 'dpm'):
    config = _make_config(solver=solver, sampler='controlled')
    config.inverse.dpm_steps = 80
    sampler = conditional_sampling.get_controlled_sampler(
        config, obsv, origin.shape, lambda t: (1.0 - t) * 0.8, eps=1e-3)
    outs[solver] = np.asarray(sampler(jax.random.PRNGKey(3), None, None, z=z))
  diff = np.abs(outs['RK45'] - outs['dpm'])
  assert diff.mean() < 0.06, diff.mean()
  assert diff.max() < 0.3, diff.max()


def test_pc_inpainter_preserves_known_region(monkeypatch):
  from b_pinn_kalman_filter_tpu.models import registry
  sde = sde_lib.VPSDE(N=100)
  score = _analytic_score(sde)
  monkeypatch.setattr(registry, 'get_score_fn', lambda *a, **k: score)

  mask = jnp.asarray(np.broadcast_to(_checkerboard(6, 6), (4, 6, 6, 1)))
  data = MU0 + S0 * jax.random.normal(jax.random.PRNGKey(0), (4, 6, 6, 1))
  inpainter = controllable.get_pc_inpainter(
      sde, None, sampling.get_predictor('euler_maruyama'),
      sampling.get_corrector('none'), lambda x: x, snr=0.16, eps=1e-3)
  out = jax.jit(lambda r: inpainter(r, None, data, mask))(jax.random.PRNGKey(1))
  m = np.asarray(mask)
  np.testing.assert_allclose(np.asarray(out) * m, np.asarray(data) * m,
                             atol=0.05)
  assert np.isfinite(np.asarray(out)).all()


def test_pc_colorizer_preserves_grayscale(monkeypatch):
  from b_pinn_kalman_filter_tpu.models import registry
  sde = sde_lib.VPSDE(N=100)

  def score3(x, t, rng=None):
    a, std = sde.marginal_coef(t)
    var = a ** 2 * S0 ** 2 + std ** 2
    return -(x - (a * MU0)[:, None, None, None]) / var[:, None, None, None]

  monkeypatch.setattr(registry, 'get_score_fn', lambda *a, **k: score3)
  gray = jnp.tile(
      jax.random.uniform(jax.random.PRNGKey(0), (2, 6, 6, 1)), (1, 1, 1, 3))
  colorizer = controllable.get_pc_colorizer(
      sde, None, sampling.get_predictor('euler_maruyama'),
      sampling.get_corrector('none'), lambda x: x, snr=0.16, eps=1e-3)
  out = jax.jit(lambda r: colorizer(r, None, gray))(jax.random.PRNGKey(1))
  # The luminance channel (decoupled channel 0) must match the input's.
  lum_out = np.asarray(controllable.decouple(out))[..., 0]
  lum_in = np.asarray(controllable.decouple(gray))[..., 0]
  np.testing.assert_allclose(lum_out, lum_in, atol=0.05)
