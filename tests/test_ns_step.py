"""NS stepper tests (ops/ns_step): gradients, CIP advection, pressure,
full step sanity (SURVEY §4a: hand-written jnp reference = spec)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from b_pinn_kalman_filter_tpu.ops import ns_step


def _bump(H, W, cx, cy, s=8.0):
  y, x = np.mgrid[0:H, 0:W]
  return np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / s).astype(np.float32)


class TestGradient:

  def test_interior_matches_numpy_gradient(self):
    f = jnp.asarray(np.random.default_rng(0).random((2, 16, 16)), jnp.float32)
    dx = 0.1
    gx, gy = ns_step.gradient(f, dx)
    ngy, ngx = np.gradient(np.asarray(f), dx, axis=(1, 2))
    np.testing.assert_allclose(gx[:, 1:-1, 1:-1], ngx[:, 1:-1, 1:-1],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gy[:, 1:-1, 1:-1], ngy[:, 1:-1, 1:-1],
                               rtol=1e-4, atol=1e-5)

  def test_edges_one_sided(self):
    f = jnp.asarray(np.arange(5, dtype=np.float32)[None, None, :]
                    * np.ones((1, 5, 1), np.float32))
    gx, gy = ns_step.gradient(f, 1.0)
    np.testing.assert_allclose(gx, 1.0, atol=1e-6)  # linear ramp
    np.testing.assert_allclose(gy, 0.0, atol=1e-6)


class TestAdvection:

  def test_constant_field_invariant(self):
    dens = jnp.ones((1, 16, 16))
    u = jnp.full((1, 16, 16), 0.7)
    v = jnp.full((1, 16, 16), -0.3)
    out = ns_step.update_density(dens, u, v, dt=0.01, dx=0.1)
    np.testing.assert_allclose(out, 1.0, atol=1e-5)

  def test_zero_velocity_identity_and_finite(self):
    """sign(0) handling must not NaN (the CUDA kernel would)."""
    dens = jnp.asarray(_bump(16, 16, 8, 8))[None]
    out = ns_step.update_density(dens, jnp.zeros_like(dens),
                                 jnp.zeros_like(dens), dt=0.01, dx=0.1)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(out, dens, atol=1e-6)

  def test_uniform_advection_translates(self):
    """CIP advection under uniform velocity ~ translation by u*dt/dx cells."""
    H = W = 64
    dx = 1.0 / W
    dt = dx  # CFL = 1 with u = 1: exactly one cell per step
    dens = jnp.asarray(_bump(H, W, 24, 32, 20.0))[None]
    u = jnp.ones((1, H, W))
    v = jnp.zeros((1, H, W))
    out = dens
    n_steps = 8
    for _ in range(n_steps):
      out = ns_step.update_density(out, u, v, dt=dt, dx=dx)
    expected = jnp.asarray(_bump(H, W, 24 + n_steps, 32, 20.0))[None]
    err = float(jnp.abs(out - expected).max())
    assert err < 0.05, err

  def test_upwind_method(self):
    dens = jnp.asarray(_bump(16, 16, 8, 8))[None]
    u = jnp.full((1, 16, 16), 0.5)
    v = jnp.zeros((1, 16, 16))
    out = ns_step.update_density(dens, u, v, dt=0.01, dx=0.1, method=1)
    gx, _ = ns_step.gradient(dens, 0.1)
    np.testing.assert_allclose(out, dens - 0.01 * 0.5 * gx, rtol=1e-5)


class TestPressureVelocity:

  def test_uniform_pressure_zero_velocity_fixed_point(self):
    p = jnp.full((1, 16, 16), 2.5)
    u = v = jnp.zeros((1, 16, 16))
    p_n = ns_step.update_pressure(u, v, p, dt=0.01, dx=0.1)
    np.testing.assert_allclose(p_n, 2.5, atol=1e-5)
    u_n, v_n = ns_step.update_velocity(u, v, p, dt=0.01, dx=0.1)
    np.testing.assert_allclose(u_n, 0.0, atol=1e-5)
    np.testing.assert_allclose(v_n, 0.0, atol=1e-5)

  def test_pressure_gradient_accelerates_flow(self):
    """A pressure ramp in x must accelerate u in -grad p direction."""
    H = W = 16
    x = np.arange(W, dtype=np.float32)[None, None, :] * np.ones((1, H, 1))
    p = jnp.asarray(x)  # dp/dx = 1
    u = v = jnp.zeros((1, H, W))
    dt, dx = 0.01, 1.0
    u_n, v_n = ns_step.update_velocity(u, v, p, dt, dx)
    np.testing.assert_allclose(u_n[:, 1:-1, 1:-1], -dt, rtol=1e-3)
    np.testing.assert_allclose(v_n[:, 1:-1, 1:-1], 0.0, atol=1e-5)

  def test_full_step_stable_and_finite(self):
    rng = np.random.default_rng(0)
    H = W = 64
    dens = jnp.asarray(rng.random((2, H, W)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((2, H, W)) * 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, H, W)) * 0.1, jnp.float32)
    p = jnp.zeros((2, H, W))
    dt, dx = 0.0025, 1.0 / 200
    step = jax.jit(lambda d, u, v, p: ns_step.ns_step(d, u, v, p, dt, dx))
    for _ in range(20):
      dens, u, v, p = step(dens, u, v, p)
    for a in (dens, u, v, p):
      assert np.isfinite(np.asarray(a)).all()

  def test_differentiable(self):
    """The CUDA op is forward-only; ours must be differentiable (UKF &
    data-generation value-add)."""
    dens = jnp.asarray(_bump(16, 16, 8, 8))[None]
    u = jnp.full((1, 16, 16), 0.5)
    v = jnp.full((1, 16, 16), 0.1)

    def loss(u):
      out = ns_step.update_density(dens, u, v, dt=0.01, dx=0.1)
      return jnp.sum(out ** 2)

    g = jax.grad(loss)(u)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
