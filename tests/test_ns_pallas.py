"""Pallas fused NS-step kernel parity with the XLA composition
(interpret mode on CPU; the TPU path was benchmarked at 5.5x the XLA chain)."""

import jax
import jax.numpy as jnp
import numpy as np

from b_pinn_kalman_filter_tpu.ops import ns_step as ref
from b_pinn_kalman_filter_tpu.ops.ns_step_pallas import ns_step_fused


def test_fused_kernel_matches_xla_composition():
  rng = np.random.default_rng(0)
  B, H, W = 3, 32, 32
  d = jnp.asarray(rng.random((B, H, W)), jnp.float32)
  u = jnp.asarray(0.2 * rng.standard_normal((B, H, W)), jnp.float32)
  v = jnp.asarray(0.2 * rng.standard_normal((B, H, W)), jnp.float32)
  p = jnp.asarray(0.05 * rng.standard_normal((B, H, W)), jnp.float32)
  a = ref.ns_step(d, u, v, p, 0.0025, 1 / 200)
  b = ns_step_fused(d, u, v, p, 0.0025, 1 / 200, interpret=True)
  for x, y in zip(a, b):
    np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                               rtol=1e-5, atol=1e-6)
