"""UKF tests: patch round-trips, exactness vs linear Kalman filter
(SURVEY §4e), NS dynamics shapes, PINN_KF smoke."""

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

from b_pinn_kalman_filter_tpu.kalman import (
    IdentityKFMeasure, NSDynamics, initialize_beliefs, merwe_weights, patch,
    ukf_step, unpatch)
from b_pinn_kalman_filter_tpu.kalman import ukf as ukf_core


class TestPatching:

  def test_roundtrip(self):
    x = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 4)),
                    jnp.float32)
    p = patch(x, 4)
    assert p.shape == (4 * 2 * 16, 16)
    back = unpatch(p, 4, 16, 4)
    np.testing.assert_allclose(back, x, rtol=1e-6)

  def test_patch_ordering_channel_first(self):
    """First quarter of the rows must be channel-0 patches."""
    x = jnp.zeros((1, 8, 8, 4)).at[..., 0].set(7.0)
    p = patch(x, 4)
    N = p.shape[0]
    np.testing.assert_allclose(p[:N // 4], 7.0)
    np.testing.assert_allclose(p[N // 4:], 0.0)


class TestUKFvsLinearKF:
  """For linear-Gaussian dynamics the UKF must match the exact KF."""

  def _run(self, n=4, steps=10, seed=0):
    rng = np.random.default_rng(seed)
    A = np.eye(n) * 0.9 + 0.05 * rng.standard_normal((n, n)).astype(np.float32)
    Q = 0.01 * np.eye(n, dtype=np.float32)
    R = 0.1 * np.eye(n, dtype=np.float32)

    def dynamics_fn(states):
      nxt = states @ jnp.asarray(A).T
      sqrt_q = jnp.linalg.cholesky(jnp.asarray(Q))[None].repeat(
          states.shape[0], axis=0)
      return nxt, sqrt_q

    def measurement_fn(states):
      covar = jnp.asarray(R)[None].repeat(states.shape[0], axis=0)
      return states, covar

    w = merwe_weights(n, alpha=1.0, beta=0.0, kappa=0.0)
    mean0 = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
    cov0 = jnp.asarray(0.5 * np.eye(n), jnp.float32)[None].repeat(2, axis=0)
    belief = initialize_beliefs(mean0, cov0)

    # Exact KF reference.
    kf_mean = np.asarray(mean0).copy()
    kf_cov = np.asarray(cov0).copy()

    observations = rng.standard_normal((steps, 2, n)).astype(np.float32)

    for obs in observations:
      belief = ukf_step(belief, jnp.asarray(obs), w, dynamics_fn,
                        measurement_fn)
      for b in range(2):
        m = A @ kf_mean[b]
        P = A @ kf_cov[b] @ A.T + Q
        S = P + R
        K = P @ np.linalg.inv(S)
        kf_mean[b] = m + K @ (obs[b] - m)
        kf_cov[b] = (np.eye(n) - K) @ P

    return belief, kf_mean, kf_cov

  def test_mean_matches_exact_kf(self):
    belief, kf_mean, kf_cov = self._run()
    np.testing.assert_allclose(np.asarray(belief.mean), kf_mean,
                               rtol=1e-3, atol=1e-4)

  def test_covariance_matches_exact_kf(self):
    belief, kf_mean, kf_cov = self._run()
    P_ukf = np.einsum('nij,nkj->nik', np.asarray(belief.sqrt_cov),
                      np.asarray(belief.sqrt_cov))
    np.testing.assert_allclose(P_ukf, kf_cov, rtol=1e-2, atol=1e-4)


def _kf_config():
  from b_pinn_kalman_filter_tpu.configs.pinn.pinn_pde import get_config
  config = get_config()
  config.data.image_size = 16
  config.kf.patch_size = 4
  config.model.feature_nums = [4, 8]
  config.training.batch_size = 1
  return config


class TestNSDynamicsModel:

  def test_shapes_and_finiteness(self):
    config = _kf_config()
    dyn = NSDynamics(config)
    N = (16 // 4) ** 2 * 4
    states = jnp.asarray(np.random.default_rng(0).random((N, 16)) * 0.1,
                         jnp.float32)
    nxt, sqrt_q = dyn(states)
    assert nxt.shape == states.shape
    assert sqrt_q.shape == (N, 16, 16)
    assert np.isfinite(np.asarray(nxt)).all()

  def test_identity_measure_covariances(self):
    config = _kf_config()
    meas = IdentityKFMeasure(config)
    N = (16 // 4) ** 2 * 4
    states = jnp.ones((N, 16))
    obs, covar = meas(states)
    np.testing.assert_allclose(obs, states)
    assert covar.shape == (N, 16, 16)
    # heteroscedastic path
    uncer_flow = jnp.full((1, 16, 16, 2), 0.2)
    uncer_pres = jnp.full((1, 16, 16, 1), 0.3)
    meas.update_uncertainty(uncer_flow, uncer_pres)
    obs, covar = meas(states)
    q = N // 4
    np.testing.assert_allclose(np.asarray(covar[0]),
                               np.eye(16) * config.inverse.variance, atol=1e-6)
    np.testing.assert_allclose(np.asarray(covar[q]), np.eye(16) * 0.04,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(covar[3 * q]), np.eye(16) * 0.09,
                               rtol=1e-5)


class TestUKFEndToEnd:

  def test_ukf_filters_noisy_ns_rollout(self):
    """Full patch-UKF on a tiny NS field: filtered estimate must beat the
    raw noisy observation."""
    from b_pinn_kalman_filter_tpu.kalman.ukf_lib import UKF
    from b_pinn_kalman_filter_tpu.ops import ns_step
    from b_pinn_kalman_filter_tpu.kalman.dynamics import NS_DT, NS_DX

    config = _kf_config()
    rng = np.random.default_rng(0)
    H = 16

    # Ground-truth trajectory via the same dynamics.
    f = jnp.asarray(rng.random((1, H, H)), jnp.float32)
    u = jnp.asarray(0.1 * rng.standard_normal((1, H, H)), jnp.float32)
    v = jnp.asarray(0.1 * rng.standard_normal((1, H, H)), jnp.float32)
    p = jnp.zeros((1, H, H))

    ukf = UKF(config)
    state0 = jnp.stack([f[0], u[0], v[0], p[0]], axis=-1)[None]
    ukf.initialize(patch(state0, 4), var=1e-4)

    var = config.inverse.variance
    errs_filt, errs_obs = [], []
    key = jax.random.PRNGKey(0)
    for step in range(3):
      u, v = ns_step.update_velocity(u, v, p, NS_DT, NS_DX)
      p = ns_step.update_pressure(u, v, p, NS_DT, NS_DX)
      f = ns_step.update_density(f, u, v, NS_DT, NS_DX)
      truth = jnp.stack([f[0], u[0], v[0], p[0]], axis=-1)[None]
      key, nkey = jax.random.split(key)
      obsv = truth + jax.random.normal(nkey, truth.shape) * var ** 0.5
      pred = ukf(obsv)
      errs_filt.append(float(jnp.mean((pred - truth) ** 2)))
      errs_obs.append(float(jnp.mean((obsv - truth) ** 2)))

    assert np.isfinite(errs_filt).all()
    assert errs_filt[-1] < errs_obs[-1], (errs_filt, errs_obs)


class TestSquareRootAtScale:
  """f32 PSD stability at the reference's real patch dimension
  (16^2 patches -> 256-dim states; VERDICT round-1 Weak #5)."""

  def test_psd_over_100_steps_n256_f32(self):
    import jax
    import jax.numpy as jnp

    from b_pinn_kalman_filter_tpu.kalman import ukf

    n = 256
    N = 1
    steps = 100
    w = ukf.merwe_weights(n)
    rng = np.random.default_rng(0)

    # Mildly contractive random linear dynamics; tiny process noise
    # (the reference uses 1e-8, ukf_utils.py:116).
    A = np.eye(n, dtype=np.float32)
    A += 0.01 * rng.standard_normal((n, n)).astype(np.float32)
    A *= 0.99
    sqrt_q = (1e-4 * np.eye(n, dtype=np.float32))[None]
    obs_var = 1e-2

    def dynamics_fn(states):
      return states @ A.T, jnp.asarray(sqrt_q)

    def measurement_fn(states):
      return states, obs_var * jnp.eye(n, dtype=jnp.float32)[None]

    x_true = rng.standard_normal(n).astype(np.float32)
    belief = ukf.initialize_beliefs(
        jnp.zeros((N, n), jnp.float32),
        jnp.eye(n, dtype=jnp.float32)[None] * 1.0)

    step = jax.jit(lambda b, obs: ukf.ukf_step(
        b, obs, w, dynamics_fn, measurement_fn))

    errs = []
    for t in range(steps):
      x_true = np.asarray(x_true @ A.T)
      obs = x_true + rng.standard_normal(n).astype(np.float32) * obs_var ** 0.5
      belief = step(belief, jnp.asarray(obs[None]))
      errs.append(float(np.mean((np.asarray(belief.mean[0]) - x_true) ** 2)))

    S = np.asarray(belief.sqrt_cov[0])
    assert np.isfinite(S).all(), "sqrt covariance went non-finite"
    assert np.isfinite(np.asarray(belief.mean)).all()
    # Lower-triangular with nonnegative diagonal = a valid Cholesky factor;
    # P = S S^T is PSD by construction.
    assert np.allclose(S, np.tril(S), atol=1e-6)
    assert (np.diag(S) >= 0).all()
    # The filter actually tracks: steady-state error well below the prior.
    assert np.mean(errs[-10:]) < 1e-2, np.mean(errs[-10:])


class TestMeshShardedUKF:
  """Filter bank sharded over the mesh data axis (kalman/ukf_lib.py):
  the sharded cycle must reproduce the single-program result, with the
  belief actually distributed over the 8 virtual devices."""

  def _drive(self, mesh):
    from b_pinn_kalman_filter_tpu.kalman.ukf_lib import UKF

    config = _kf_config()
    ukf = UKF(config, mesh=mesh)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.random((64, 16)), jnp.float32)  # N=64 patches, n=16
    ukf.initialize(x0, var=1e-3)
    # Heteroscedastic B-PINN uncertainties (quarter=16 -> 32 flow + 16 pres).
    ukf.measurement.update_uncertainty(
        jnp.asarray(0.05 + 0.01 * rng.random((1, 16, 16, 2)), jnp.float32),
        jnp.asarray(0.05 + 0.01 * rng.random((1, 16, 16, 1)), jnp.float32))
    outs = []
    for step in range(2):
      obsv = jnp.asarray(rng.random((1, 16, 16, 4)), jnp.float32)
      outs.append(np.asarray(ukf(obsv)))
    return outs, ukf

  def test_sharded_cycle_matches_single_device(self):
    from b_pinn_kalman_filter_tpu.parallel import mesh as mesh_lib

    ref_outs, _ = self._drive(mesh=None)
    mesh = mesh_lib.create_mesh(_kf_config())
    assert mesh_lib.get_data_axis_size(mesh) == len(jax.devices()), \
        "conftest should give 8 virtual devices"
    sh_outs, ukf = self._drive(mesh=mesh)

    for a, b in zip(sh_outs, ref_outs):
      np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)
    # The belief really is distributed: each filter row lives on one device.
    sharding = ukf.belief.mean.sharding
    assert not sharding.is_fully_replicated
    assert sharding.shard_shape(ukf.belief.mean.shape)[0] \
        == 64 // len(jax.devices())
