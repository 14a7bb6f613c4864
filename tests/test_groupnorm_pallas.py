"""Interpret-mode parity tests for the fused GroupNorm(+act) Pallas kernel."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from b_pinn_kalman_filter_tpu.ops.groupnorm_pallas import (
    fits_fused_groupnorm, groupnorm_act)


def _flax_gn_act(x, scale, bias, num_groups, act):
  gn = nn.GroupNorm(num_groups=num_groups, epsilon=1e-6)
  y = gn.apply({'params': {'scale': scale, 'bias': bias}}, x)
  if act == 'silu':
    y = jax.nn.silu(y)
  elif act == 'elu':
    y = jax.nn.elu(y)
  return y


@pytest.mark.parametrize('shape,groups', [
    ((4, 8, 8, 128), 32),
    ((2, 16, 16, 256), 32),
    ((3, 4, 4, 128), 4),
])
@pytest.mark.parametrize('act', ['silu', 'none'])
def test_matches_flax_groupnorm_f32(shape, groups, act):
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
  scale = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
  bias = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
  got = groupnorm_act(x, scale, bias, num_groups=groups, act=act,
                      interpret=True)
  want = _flax_gn_act(x, scale, bias, groups, act)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-5, atol=2e-5)


def test_bf16_io_f32_stats():
  rng = np.random.default_rng(1)
  x32 = rng.standard_normal((2, 8, 8, 128)).astype(np.float32)
  x = jnp.asarray(x32, jnp.bfloat16)
  scale = jnp.ones((128,), jnp.float32)
  bias = jnp.zeros((128,), jnp.float32)
  got = groupnorm_act(x, scale, bias, num_groups=32, interpret=True)
  assert got.dtype == jnp.bfloat16
  want = _flax_gn_act(x.astype(jnp.float32), scale, bias, 32, 'silu')
  np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                             rtol=0.05, atol=0.05)


def test_gradients_match_flax():
  # DPS differentiates through the score net, so the fused path carries a
  # custom VJP (recompute through the jnp reference).
  rng = np.random.default_rng(5)
  x = jnp.asarray(rng.standard_normal((2, 4, 4, 128)), jnp.float32)
  scale = jnp.asarray(rng.standard_normal(128), jnp.float32)
  bias = jnp.asarray(rng.standard_normal(128), jnp.float32)

  def loss_fused(x, s, b):
    return jnp.sum(groupnorm_act(x, s, b, num_groups=32, interpret=True) ** 2)

  def loss_flax(x, s, b):
    return jnp.sum(_flax_gn_act(x, s, b, 32, 'silu') ** 2)

  g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
  g_flax = jax.grad(loss_flax, argnums=(0, 1, 2))(x, scale, bias)
  for a, b_ in zip(g_fused, g_flax):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                               rtol=2e-4, atol=2e-4)


def test_dispatch_guard():
  assert fits_fused_groupnorm((2, 8, 8, 128), 32)
  assert not fits_fused_groupnorm((2, 8, 8, 96), 32)   # lane misalign
  assert not fits_fused_groupnorm((2, 8, 128), 32)     # not 4D
  assert not fits_fused_groupnorm((2, 8, 8, 128), 48)  # groups don't divide


@pytest.mark.parametrize('config_name', ['vp/cifar10_ddpmpp_continuous',
                                         'vp/cifar10_ncsnpp_continuous'])
def test_ddpm_model_fused_gn_matches_unfused(monkeypatch, config_name):
  """tpu.fused_groupnorm: identical param tree, matching outputs."""
  from b_pinn_kalman_filter_tpu.ops import groupnorm_pallas
  monkeypatch.setattr(groupnorm_pallas, 'FORCE_INTERPRET', True)
  from b_pinn_kalman_filter_tpu import configs, models as mutils

  def build(fused):
    config = configs.get_config(config_name)
    config.model.nf = 128        # lane-aligned channels so fusion dispatches
    config.model.ch_mult = (1,)
    config.model.num_res_blocks = 1
    config.model.attn_resolutions = ()
    config.data.image_size = 8
    config.model.num_scales = 10
    config.tpu.compute_dtype = 'float32'
    config.tpu.fused_groupnorm = fused
    return mutils.init_model(jax.random.PRNGKey(0), config)

  model_f, vars_f = build(True)
  model_d, vars_d = build(False)
  paths_f = {jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_leaves_with_path(vars_f['params'])}
  paths_d = {jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_leaves_with_path(vars_d['params'])}
  assert paths_f == paths_d

  x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 3)),
                  jnp.float32)
  labels = jnp.asarray([0.1, 0.5], jnp.float32) * 999
  y_f = model_f.apply(vars_d, x, labels, train=False)
  y_d = model_d.apply(vars_d, x, labels, train=False)
  np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_d),
                             rtol=2e-4, atol=2e-4)
