"""Tests for API-parity helpers: EMA shim, bcmm, conditional norms,
dataset transforms, flatten bridges."""

import jax
import jax.numpy as jnp
import numpy as np


def test_ema_shim_matches_in_state_ema():
  from b_pinn_kalman_filter_tpu.models.ema import ExponentialMovingAverage
  params = {'w': jnp.ones((3,)) * 2.0}
  ema = ExponentialMovingAverage(params, decay=0.999)
  new = {'w': jnp.ones((3,)) * 4.0}
  ema.update(new)
  # warmup decay after 1 update: min(0.999, 2/11)
  d = 2 / 11
  expected = 2.0 * d + 4.0 * (1 - d)
  np.testing.assert_allclose(ema.shadow_params['w'], expected, rtol=1e-6)
  stored = ema.state_dict()
  ema2 = ExponentialMovingAverage(params, decay=0.5)
  ema2.load_state_dict(stored)
  np.testing.assert_allclose(ema2.shadow_params['w'], expected, rtol=1e-6)


def test_bcmm_matches_loop():
  from b_pinn_kalman_filter_tpu.inverse.operators import bcmm
  rng = np.random.default_rng(0)
  m = jnp.asarray(rng.standard_normal((2, 3, 4, 5)), jnp.float32)
  v = jnp.asarray(rng.standard_normal((2, 3, 4)), jnp.float32)
  out = bcmm(m, v)
  expected = np.einsum('bcmn,bcm->bcn', np.asarray(m), np.asarray(v))
  np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_conditional_norms_forward():
  from b_pinn_kalman_filter_tpu.models import normalization as N
  x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 4, 8)),
                  jnp.float32)
  y = jnp.asarray([0, 3])
  for cls in (N.ConditionalBatchNorm2d, N.ConditionalInstanceNorm2d,
              N.ConditionalVarianceNorm2d, N.ConditionalNoneNorm2d,
              N.ConditionalInstanceNorm2dPlus):
    m = cls(num_classes=5)
    variables = m.init(jax.random.PRNGKey(0), x, y)
    out = m.apply(variables, x, y)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all(), cls.__name__


def test_dataset_transforms():
  from b_pinn_kalman_filter_tpu.data.datasets import Binarize, Repeat
  img = np.asarray([[0.2, 0.8], [0.6, 0.4]])
  b = Binarize(0.5)(img)
  np.testing.assert_allclose(b, [[0, 1], [1, 0]])
  binv = Binarize(0.5, invert=True)(img)
  np.testing.assert_allclose(binv, [[1, 0], [0, 1]])
  r = Repeat(3)(img)
  assert r.shape == (3, 2, 2)


def test_flatten_bridges():
  from b_pinn_kalman_filter_tpu.models.registry import (
      from_flattened_numpy, to_flattened_numpy)
  x = jnp.asarray(np.arange(24.0).reshape(2, 3, 4))
  flat = to_flattened_numpy(x)
  assert flat.shape == (24,)
  back = from_flattened_numpy(flat, (2, 3, 4))
  np.testing.assert_allclose(back, x)
