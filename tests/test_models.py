"""Model family tests: NCSN++ (all progressive variants), NCSNv2, DDPM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from b_pinn_kalman_filter_tpu import models as mutils
from tests.tiny_configs import tiny_ddpm_config, tiny_ncsnpp_config


def _forward(config, labels=None):
  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  B = 2
  x = jax.random.uniform(
      jax.random.PRNGKey(1),
      (B, config.data.image_size, config.data.image_size,
       config.data.num_channels))
  if labels is None:
    labels = jnp.asarray([0.5, 1.0])
  out = model.apply(variables, x, labels, train=False)
  assert out.shape == x.shape
  assert np.isfinite(np.asarray(out)).all()
  return out


class TestNCSNpp:

  def test_fourier_biggan_residual_input(self):
    config = tiny_ncsnpp_config()   # fir=True, biggan, progressive_input=residual
    _forward(config, labels=jnp.asarray([1.0, 5.0]))  # sigma labels

  def test_positional_ddpm_blocks(self):
    config = tiny_ncsnpp_config()
    config.model.embedding_type = 'positional'
    config.model.resblock_type = 'ddpm'
    config.model.progressive_input = 'none'
    config.model.scale_by_sigma = False
    _forward(config, labels=jnp.asarray([3.0, 7.0]))

  def test_progressive_output_skip(self):
    config = tiny_ncsnpp_config()
    config.model.progressive = 'output_skip'
    config.model.progressive_input = 'input_skip'
    config.model.progressive_combine = 'cat'
    _forward(config, labels=jnp.asarray([1.0, 2.0]))

  def test_progressive_residual_both(self):
    config = tiny_ncsnpp_config()
    config.model.progressive = 'residual'
    config.model.progressive_input = 'residual'
    _forward(config, labels=jnp.asarray([1.0, 2.0]))

  def test_no_fir(self):
    config = tiny_ncsnpp_config()
    config.model.fir = False
    _forward(config, labels=jnp.asarray([1.0, 2.0]))

  def test_scale_by_sigma_divides_output(self):
    config = tiny_ncsnpp_config()
    model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
    x = jnp.ones((2, 16, 16, 1)) * 0.3
    sig = jnp.asarray([2.0, 2.0])
    out1 = model.apply(variables, x, sig, train=False)
    # doubling sigma labels in fourier/scale_by_sigma mode changes scaling
    out2 = model.apply(variables, x, sig * 2, train=False)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


class TestNCSNv2:

  def _config(self, name='ncsnv2_64'):
    config = tiny_ddpm_config()
    config.model.name = name
    config.model.normalization = 'InstanceNorm++'
    config.model.nonlinearity = 'elu'
    config.model.scale_by_sigma = True
    config.model.num_scales = 16
    config.data.image_size = 16
    config.model.nf = 8
    if name == 'ncsn':
      config.model.num_classes = 16
    return config

  def test_ncsnv2_64_forward(self):
    config = self._config()
    _forward(config, labels=jnp.asarray([0, 5]))

  def test_ncsn_conditional_forward(self):
    config = self._config('ncsn')
    _forward(config, labels=jnp.asarray([0, 5]))

  def test_get_network_dispatch(self):
    from b_pinn_kalman_filter_tpu.models import ncsnv2
    config = self._config()
    assert ncsnv2.get_network(config).func is ncsnv2.NCSNv2
    config.data.image_size = 128
    assert ncsnv2.get_network(config).func is ncsnv2.NCSNv2_128
    config.data.image_size = 256
    assert ncsnv2.get_network(config).func is ncsnv2.NCSNv2_256


def test_registry_has_all_reference_models():
  """Registered names must cover the reference registry
  (reference models/utils.py registered: ddpm, ncsnpp, ncsnv2_64, ncsn,
  ncsnv2_128, ncsnv2_256)."""
  from b_pinn_kalman_filter_tpu.models.registry import _MODELS
  for name in ['ddpm', 'ncsnpp', 'ncsnv2_64', 'ncsn', 'ncsnv2_128',
               'ncsnv2_256']:
    assert name in _MODELS, f'{name} missing from registry'


class TestRemat:
  """config.tpu.remat wraps resblocks in jax.checkpoint (VERDICT Weak #2)."""

  def _remat_matches(self, config, labels):
    config.tpu.remat = False
    model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
    B = 2
    x = jax.random.uniform(
        jax.random.PRNGKey(1),
        (B, config.data.image_size, config.data.image_size,
         config.data.num_channels))
    base = model.apply(variables, x, labels, train=False)

    config.tpu.remat = True
    model_r, _ = mutils.init_model(jax.random.PRNGKey(0), config)
    rematted = model_r.apply(variables, x, labels, train=False)
    np.testing.assert_allclose(np.asarray(base), np.asarray(rematted),
                               rtol=1e-5, atol=1e-5)

    # Gradients must flow through the checkpointed blocks.
    def loss(params):
      return jnp.sum(model_r.apply(params, x, labels, train=False) ** 2)
    g = jax.grad(loss)(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)

  def test_ddpm_remat(self):
    self._remat_matches(tiny_ddpm_config(), jnp.asarray([0.5, 1.0]))

  def test_ncsnpp_remat(self):
    self._remat_matches(tiny_ncsnpp_config(), jnp.asarray([1.0, 5.0]))
