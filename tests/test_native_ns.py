"""Native C++ NS simulator parity with the jnp op (ops/ns_step)."""

import numpy as np
import pytest

from b_pinn_kalman_filter_tpu.data import native


@pytest.fixture(scope='module')
def lib():
  lib = native.get_lib()
  if lib is None:
    pytest.skip('native ns_sim library unavailable (no g++?)')
  return lib


def test_native_step_matches_jnp(lib):
  import jax.numpy as jnp
  from b_pinn_kalman_filter_tpu.ops import ns_step

  rng = np.random.default_rng(0)
  H = W = 32
  dens = rng.random((H, W)).astype(np.float32)
  u = (0.2 * rng.standard_normal((H, W))).astype(np.float32)
  v = (0.2 * rng.standard_normal((H, W))).astype(np.float32)
  p = (0.05 * rng.standard_normal((H, W))).astype(np.float32)
  dt, dx = 0.0025, 1.0 / 200

  dj, uj, vj, pj = ns_step.ns_step(
      jnp.asarray(dens)[None], jnp.asarray(u)[None], jnp.asarray(v)[None],
      jnp.asarray(p)[None], dt, dx)

  dn, un, vn, pn = dens.copy(), u.copy(), v.copy(), p.copy()
  assert native.ns_sim_step(dn, un, vn, pn, dt, dx)

  np.testing.assert_allclose(un, np.asarray(uj[0]), rtol=1e-3, atol=1e-5)
  np.testing.assert_allclose(vn, np.asarray(vj[0]), rtol=1e-3, atol=1e-5)
  np.testing.assert_allclose(pn, np.asarray(pj[0]), rtol=1e-3, atol=1e-4)
  np.testing.assert_allclose(dn, np.asarray(dj[0]), rtol=1e-3, atol=1e-5)


def test_native_rollout_shapes_and_finite(lib):
  rng = np.random.default_rng(1)
  H = W = 24
  coordx, coordy = np.meshgrid(np.linspace(0, 1, W, dtype=np.float32),
                               np.linspace(0, 1, H, dtype=np.float32))
  out = native.ns_sim_rollout(
      50, rng.random((H, W)).astype(np.float32),
      (0.2 * rng.standard_normal((H, W))).astype(np.float32),
      (0.2 * rng.standard_normal((H, W))).astype(np.float32),
      np.zeros((H, W), np.float32), coordx.astype(np.float32),
      coordy.astype(np.float32), 0.0025, 1.0 / 200)
  assert out is not None
  assert out.shape == (50, 6, H, W)
  assert np.isfinite(out).all()
  # coord channels constant
  np.testing.assert_allclose(out[0, 0], coordx)
  np.testing.assert_allclose(out[-1, 1], coordy)
