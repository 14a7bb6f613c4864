"""PINN stack tests: NS residual correctness (Taylor–Green), FlowNet /
PressureNet forward, prelim + PINN train steps, B-PINN posterior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from b_pinn_kalman_filter_tpu.configs.pinn.pinn_pde import get_config as pde_config
from b_pinn_kalman_filter_tpu.pinn import bayes, losses as pinn_losses
from b_pinn_kalman_filter_tpu.pinn import pinn as pinn_mod


def tiny_pinn_config():
  config = pde_config()
  config.data.image_size = 16
  config.model.feature_nums = [4, 8]
  config.training.batch_size = 2
  config.optim.warmup = 2
  return config


class TestEquationMSE:
  """Analytic-field checks on 1x1 grids, where the reference's
  sum-then-grad semantics reduce to exact pointwise partials (SURVEY §4d)."""

  def _tg_uvp(self, Re):
    nu = 1.0 / Re

    def apply_uvp(x, y, t):
      tt = t[:, None, None, None]
      F = jnp.exp(-2 * nu * tt)
      u = jnp.cos(x) * jnp.sin(y) * F
      v = -jnp.sin(x) * jnp.cos(y) * F
      p = -0.25 * (jnp.cos(2 * x) + jnp.cos(2 * y)) * F ** 2
      return u, v, p

    return apply_uvp

  def test_taylor_green_residual_is_zero(self):
    Re = 100.0
    rng = np.random.default_rng(0)
    B = 16
    x = jnp.asarray(rng.uniform(0, 2 * np.pi, (B, 1, 1, 1)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 2 * np.pi, (B, 1, 1, 1)), jnp.float32)
    t = jnp.asarray(rng.uniform(0, 0.5, (B,)), jnp.float32)
    res = pinn_mod.equation_mse(self._tg_uvp(Re), x, y, t, Re)
    assert float(res) < 1e-6, float(res)

  def test_wrong_field_has_nonzero_residual(self):
    Re = 100.0

    def bad_uvp(x, y, t):
      u = x ** 2
      v = y ** 2
      p = jnp.zeros_like(x)
      return u, v, p

    B = 8
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0.5, 1.5, (B, 1, 1, 1)), jnp.float32)
    y = jnp.asarray(rng.uniform(0.5, 1.5, (B, 1, 1, 1)), jnp.float32)
    t = jnp.zeros((B,), jnp.float32)
    res = pinn_mod.equation_mse(bad_uvp, x, y, t, Re)
    # continuity residual alone: (2x + 2y)^2 >> 0
    assert float(res) > 1.0


class TestPINNForward:

  def test_forward_shapes(self):
    config = tiny_pinn_config()
    model, variables = _init(config)
    B, H = 2, config.data.image_size
    f = jnp.zeros((B, H, H, 1))
    xy = jnp.linspace(0, 1, H)
    x = jnp.broadcast_to(xy[None, None, :, None], (B, H, H, 1))
    y = jnp.broadcast_to(xy[None, :, None, None], (B, H, H, 1))
    t = jnp.asarray([1.0, 2.0])
    flow, pres = model.apply(variables, f, f, x, y, t, train=False)
    # fln levels + 1 final upsample
    assert len(flow) == len(config.model.feature_nums) + 1
    assert flow[-1].shape == (B, H, H, 2)
    assert pres.shape == (B, H, H, 1)
    for a in flow + [pres]:
      assert np.isfinite(np.asarray(a)).all()

  def test_correlation_matches_naive(self):
    from b_pinn_kalman_filter_tpu.ops.correlation import correlation, correlation_ref
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.standard_normal((2, 8, 9, 4)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((2, 8, 9, 4)), jnp.float32)
    for stride in (1, 2):
      got = correlation(f1, f2, stride=stride)
      ref = correlation_ref(f1, f2, stride=stride)
      assert got.shape == ref.shape
      np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def _init(config):
  return pinn_mod.PINN(config), _init_vars(config)


def _init_vars(config):
  from b_pinn_kalman_filter_tpu.pinn.pinn_lib import init_pinn
  model, variables = init_pinn(config, jax.random.PRNGKey(0))
  return variables


def _batch(config):
  B, H = config.training.batch_size, config.data.image_size
  rng = np.random.default_rng(0)
  f1 = jnp.asarray(rng.random((B, H, H, 1)), jnp.float32)
  f2 = jnp.asarray(rng.random((B, H, H, 1)), jnp.float32)
  xy = jnp.linspace(0, 1, H, dtype=jnp.float32)
  x = jnp.broadcast_to(xy[None, None, :, None], (B, H, H, 1))
  y = jnp.broadcast_to(xy[None, :, None, None], (B, H, H, 1))
  t = jnp.asarray(rng.random(B), jnp.float32)
  target = jnp.asarray(rng.standard_normal((B, H, H, 3)), jnp.float32)
  return (f1, f2, x, y, t, target)


class TestPINNTraining:

  def test_prelim_step(self):
    config = tiny_pinn_config()
    from b_pinn_kalman_filter_tpu.pinn.pinn_lib import init_pinn
    from b_pinn_kalman_filter_tpu.train import state as state_lib
    model, variables = init_pinn(config, jax.random.PRNGKey(0))
    tx = pinn_losses.get_pinn_optimizer(config, lr_mul_pres=0.001)
    state = state_lib.create_train_state(variables['params'], tx,
                                         config.model.ema_rate)
    step_fn = jax.jit(pinn_losses.get_prelim_step_fn(config, model, tx, True))
    mask = jnp.ones((config.data.image_size, config.data.image_size, 1))
    state, (loss, v, p) = step_fn(jax.random.PRNGKey(1), state, mask,
                                  _batch(config))
    assert np.isfinite(float(loss)) and int(state.step) == 1

  def test_pinn_step_with_residual(self):
    config = tiny_pinn_config()
    from b_pinn_kalman_filter_tpu.pinn.pinn_lib import init_pinn
    from b_pinn_kalman_filter_tpu.train import state as state_lib
    model, variables = init_pinn(config, jax.random.PRNGKey(0))
    tx = pinn_losses.get_pinn_optimizer(config, lr_mul_pres=0.005)
    state = state_lib.create_train_state(variables['params'], tx,
                                         config.model.ema_rate)
    step_fn = jax.jit(pinn_losses.get_pinn_step_fn(config, model, tx, True))
    mask = jnp.ones((config.data.image_size, config.data.image_size, 1))
    state, (loss, pinn_l, data_l) = step_fn(jax.random.PRNGKey(1), state,
                                            mask, _batch(config))
    assert np.isfinite(float(loss))
    assert float(pinn_l) >= 0
    assert int(state.step) == 1


class TestBPINN:

  def test_moped_init_sigma(self):
    config = tiny_pinn_config()
    variables = _init_vars(config)
    bp = bayes.make_bpinn_params(variables['params'], config, pretrained=True)
    mu = jax.tree_util.tree_leaves(bp['flownet']['mu'])[0]
    rho = jax.tree_util.tree_leaves(bp['flownet']['rho'])[0]
    sigma = np.asarray(jax.nn.softplus(rho))
    delta = config.model.bpinn_moped_delta
    np.testing.assert_allclose(sigma, delta * np.abs(np.asarray(mu)),
                               rtol=1e-4, atol=1e-8)

  def test_kl_zero_at_prior(self):
    mu = {'a': jnp.zeros((3, 3))}
    rho = {'a': bayes.inv_softplus(jnp.full((3, 3), 0.1))}
    bp = {'flownet': {'mu': mu, 'rho': rho},
          'pressurenet': {'mu': {'a': jnp.zeros((2,))},
                          'rho': {'a': bayes.inv_softplus(jnp.full((2,), 0.01))}}}
    kf, kp = bayes.kl_loss(bp)
    assert abs(float(kf)) < 1e-4 and abs(float(kp)) < 1e-4

  def test_sample_and_predict(self):
    config = tiny_pinn_config()
    from b_pinn_kalman_filter_tpu.pinn.pinn_lib import init_pinn
    model, variables = init_pinn(config, jax.random.PRNGKey(0))
    bp = bayes.make_bpinn_params(variables['params'], config, pretrained=True)
    f1, f2, x, y, t, target = _batch(config)
    out = bayes.predict(jax.random.PRNGKey(2), model, bp, f1, f2, x, y, t,
                        dt=config.data.dt, n=4)
    flow_m, pres_m, f_m, flow_s, pres_s, f_s = out
    B, H = config.training.batch_size, config.data.image_size
    assert flow_m.shape == (B, H, H, 2)
    assert pres_m.shape == (B, H, H, 1)
    assert f_m.shape == f2.shape
    # Posterior has nonzero spread.
    assert float(jnp.mean(flow_s)) > 0

  def test_bpinn_train_step(self):
    config = tiny_pinn_config()
    from b_pinn_kalman_filter_tpu.pinn.pinn_lib import init_pinn
    from b_pinn_kalman_filter_tpu.train import state as state_lib
    model, variables = init_pinn(config, jax.random.PRNGKey(0))
    bp = bayes.make_bpinn_params(variables['params'], config, pretrained=True)
    tx = pinn_losses.get_pinn_optimizer(config, lr_mul_pres=0.05,
                                        is_bpinn=True)
    state = state_lib.create_train_state(bp, tx, config.model.ema_rate)
    step_fn = jax.jit(bayes.get_bpinn_prelim_step_fn(config, model, tx, True))
    mask = jnp.ones((config.data.image_size, config.data.image_size, 1))
    state, (loss, v, p) = step_fn(jax.random.PRNGKey(1), state, mask,
                                  _batch(config))
    assert np.isfinite(float(loss)) and int(state.step) == 1


def test_flownet_rejects_indivisible_image_size():
  """The coarse-to-fine cascade needs image_size % 2^levels == 0; FlowNet
  must fail with a clear message instead of a shape error 4 levels deep
  (models/flownet.py)."""
  config = tiny_pinn_config()
  config.data.image_size = 16
  config.model.feature_nums = [4, 8, 16, 32, 64]   # 5 levels: 16 % 32 != 0
  from b_pinn_kalman_filter_tpu.pinn.pinn_lib import init_pinn
  with pytest.raises(ValueError, match='divisible by 2\\^5'):
    init_pinn(config, jax.random.PRNGKey(0))
