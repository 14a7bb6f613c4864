"""Winograd F(2x2,3x3) conv: parity vs lax.conv, autodiff, model wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from b_pinn_kalman_filter_tpu.ops import winograd as wg


def _direct(x, w, b=None):
  out = jax.lax.conv_general_dilated(
      x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  if b is not None:
    out = out + b
  return out


@pytest.mark.parametrize('shape', [(2, 8, 8, 32, 64), (1, 7, 9, 32, 32),
                                   (3, 16, 16, 128, 128), (1, 5, 4, 33, 48)])
def test_parity_f32(shape):
  B, H, W, Cin, Cout = shape
  k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
  x = jax.random.normal(k1, (B, H, W, Cin), jnp.float32)
  w = jax.random.normal(k2, (3, 3, Cin, Cout), jnp.float32) * 0.1
  b = jax.random.normal(k3, (Cout,), jnp.float32)
  ref = _direct(x, w, b)
  out = wg.winograd_conv3x3(x, w, b)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             rtol=2e-5, atol=2e-5)


def test_parity_bf16_close_to_f32_truth():
  k1, k2 = jax.random.split(jax.random.PRNGKey(1))
  x = jax.random.normal(k1, (2, 16, 16, 64), jnp.float32)
  w = jax.random.normal(k2, (3, 3, 64, 64), jnp.float32) * 0.05
  truth = np.asarray(_direct(x, w))
  out = np.asarray(wg.winograd_conv3x3(x, w, compute_dtype=jnp.bfloat16),
                   np.float32)
  scale = np.abs(truth).max()
  # bf16 winograd error stays within a small factor of bf16 direct conv.
  assert np.abs(out - truth).max() / scale < 0.03


def test_gradients_match_direct():
  k1, k2 = jax.random.split(jax.random.PRNGKey(2))
  x = jax.random.normal(k1, (1, 8, 8, 32), jnp.float32)
  w0 = jax.random.normal(k2, (3, 3, 32, 32), jnp.float32) * 0.1

  gw_w = jax.grad(lambda w: jnp.sum(jnp.sin(wg.winograd_conv3x3(x, w))))(w0)
  gw_d = jax.grad(lambda w: jnp.sum(jnp.sin(_direct(x, w))))(w0)
  np.testing.assert_allclose(np.asarray(gw_w), np.asarray(gw_d),
                             rtol=1e-4, atol=1e-5)

  gx_w = jax.grad(lambda x: jnp.sum(jnp.cos(wg.winograd_conv3x3(x, w0))))(x)
  gx_d = jax.grad(lambda x: jnp.sum(jnp.cos(_direct(x, w0))))(x)
  np.testing.assert_allclose(np.asarray(gx_w), np.asarray(gx_d),
                             rtol=1e-4, atol=1e-5)


def test_applicable_guard():
  assert wg.winograd_applicable((1, 8, 8, 64), (3, 3, 64, 64))
  assert not wg.winograd_applicable((1, 8, 8, 64), (3, 3, 64, 64), stride=2)
  assert not wg.winograd_applicable((1, 8, 8, 64), (3, 3, 64, 64), dilation=2)
  assert not wg.winograd_applicable((1, 8, 8, 3), (3, 3, 3, 64))     # thin in
  assert not wg.winograd_applicable((1, 8, 8, 64), (3, 3, 64, 3))    # thin out


@pytest.mark.parametrize('variant', ['dot1', 'dot3'])
@pytest.mark.parametrize('shape', [(2, 8, 8, 128, 128), (1, 16, 16, 128, 256)])
def test_fused_kernel_interpret_parity(shape, variant):
  """The Pallas kernel (interpret mode) matches lax.conv exactly in f32."""
  from b_pinn_kalman_filter_tpu.ops import winograd_pallas as wp
  B, H, W, Cin, Cout = shape
  k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
  x = jax.random.normal(k1, (B, H, W, Cin), jnp.float32)
  w = jax.random.normal(k2, (3, 3, Cin, Cout), jnp.float32) * 0.1
  b = jax.random.normal(k3, (Cout,), jnp.float32)
  ref = _direct(x, w, b)
  U = wg.transform_kernel(w).reshape(16, Cin, Cout)
  out = wp.winograd_conv3x3_fused(x, U, b, interpret=True, variant=variant)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             rtol=2e-5, atol=2e-5)


def test_conv3x3_fast_dispatch_and_grad():
  """conv3x3_fast matches the direct conv (it routes direct on CPU) and is
  differentiable wrt inputs, kernel, and bias."""
  k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
  x = jax.random.normal(k1, (2, 8, 8, 128), jnp.float32)
  w = jax.random.normal(k2, (3, 3, 128, 128), jnp.float32) * 0.1
  b = jax.random.normal(k3, (128,), jnp.float32)
  out = wg.conv3x3_fast(x, w, b)
  np.testing.assert_allclose(np.asarray(out), np.asarray(_direct(x, w, b)),
                             rtol=2e-5, atol=2e-5)
  grads = jax.grad(lambda x, w, b: jnp.sum(jnp.sin(wg.conv3x3_fast(x, w, b))),
                   argnums=(0, 1, 2))(x, w, b)
  assert all(np.isfinite(np.asarray(g)).all() for g in grads)


def test_fold_at_into_u_consistency():
  from b_pinn_kalman_filter_tpu.ops import winograd_pallas as wp
  U = jax.random.normal(jax.random.PRNGKey(5), (16, 4, 6))
  U3 = wp.fold_at_into_u(U)
  assert U3.shape == (8, 12, 6)
  U4 = np.asarray(U).reshape(4, 4, 4, 6)
  np.testing.assert_allclose(np.asarray(U3[0]),
                             np.concatenate([U4[0, 0], U4[0, 1], U4[0, 2]]))
  np.testing.assert_allclose(np.asarray(U3[7]),
                             np.concatenate([U4[3, 1], -U4[3, 2], -U4[3, 3]]))


def test_model_param_tree_and_output_invariant():
  """tpu.winograd toggling must not change the param tree or (in f32) the
  model function — checkpoints stay interchangeable."""
  from b_pinn_kalman_filter_tpu import configs, models as mutils
  config = configs.get_config('vp/cifar10_ddpmpp_continuous')
  config.model.nf = 32
  config.model.num_res_blocks = 1
  config.tpu.compute_dtype = 'float32'

  config.tpu.winograd = False
  model_d, vars_d = mutils.init_model(jax.random.PRNGKey(0), config)
  config.tpu.winograd = True
  model_w, vars_w = mutils.init_model(jax.random.PRNGKey(0), config)

  assert (jax.tree_util.tree_structure(vars_d['params'])
          == jax.tree_util.tree_structure(vars_w['params']))

  x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
  labels = jnp.array([10.0, 500.0])
  y_d = model_d.apply({'params': vars_d['params']}, x, labels, train=False)
  y_w = model_w.apply({'params': vars_d['params']}, x, labels, train=False)
  scale = float(jnp.max(jnp.abs(y_d))) + 1e-12
  assert float(jnp.max(jnp.abs(y_d - y_w))) / scale < 1e-4
