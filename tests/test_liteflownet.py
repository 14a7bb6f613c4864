"""LiteFlowNet forward/composition tests."""

import jax
import jax.numpy as jnp
import numpy as np

from b_pinn_kalman_filter_tpu.configs.pinn.pinn_pde import get_config as pde_config


def _config():
  config = pde_config()
  config.data.image_size = 64  # level-6 features must be >1px (H/32)
  config.model.arch = 'liteflownet'
  config.training.batch_size = 2
  return config


def test_liteflownet_forward_shapes():
  from b_pinn_kalman_filter_tpu.models.liteflownet import LiteFlowNet
  config = _config()
  model = LiteFlowNet(config)
  B, H = 2, 64
  f = jnp.asarray(np.random.default_rng(0).random((B, H, H, 1)), jnp.float32)
  variables = model.init(jax.random.PRNGKey(0), f, f, train=False)
  flows = model.apply(variables, f, f, train=False)
  assert len(flows) == 6
  # levels 6..2 then full resolution
  expected = [H // 32, H // 16, H // 8, H // 4, H // 2, H]
  for fl, e in zip(flows, expected):
    assert fl.shape == (B, e, e, 2), (fl.shape, e)
    assert np.isfinite(np.asarray(fl)).all()


def test_liteflownet_composes_with_pinn():
  from b_pinn_kalman_filter_tpu.pinn.pinn_lib import init_pinn
  config = _config()
  model, variables = init_pinn(config, jax.random.PRNGKey(0))
  B, H = 2, 64
  rng = np.random.default_rng(1)
  f = jnp.asarray(rng.random((B, H, H, 1)), jnp.float32)
  xy = jnp.linspace(0, 1, H, dtype=jnp.float32)
  x = jnp.broadcast_to(xy[None, None, :, None], (B, H, H, 1))
  y = jnp.broadcast_to(xy[None, :, None, None], (B, H, H, 1))
  t = jnp.asarray([1.0, 2.0])
  flow, pres = model.apply(variables, f, f, x, y, t, train=False)
  assert flow[-1].shape == (B, H, H, 2)
  assert pres.shape == (B, H, H, 1)
  assert np.isfinite(np.asarray(pres)).all()
