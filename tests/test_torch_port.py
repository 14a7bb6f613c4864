"""Reference-checkpoint converter parity tests (models/torch_port.py).

An independent NCHW torch DDPM oracle (tests/torch_ddpm_oracle.py) with
reference-format state-dict keys is converted to flax params; the NHWC flax
model must reproduce its outputs.  This cross-validates the module-walk
order, kernel transposes, GroupNorm conventions, attention math and the
resampling paddings — end-to-end, the way a migrated reference checkpoint
would actually be used (reference checkpoint layout: utils.py:109-128).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from b_pinn_kalman_filter_tpu.models import ddpm as ddpm_lib
from b_pinn_kalman_filter_tpu.models import registry, torch_port
from tests import tiny_configs
from tests.torch_ddpm_oracle import TorchDDPM


def _parity_config(scale_by_sigma=False):
  # GroupNorm(32, C) on the torch side needs every channel count to be a
  # multiple of 32, so this "tiny" config uses nf=32 (channels 32/64 at
  # 8x8 / 4x4 -- still sub-second on CPU).
  config = tiny_configs.tiny_ddpm_config()
  config.model.nf = 32
  config.data.num_channels = 3
  config.data.centered = True
  config.model.scale_by_sigma = scale_by_sigma
  config.tpu.compute_dtype = 'float32'
  return config


def _oracle_and_flax(config, seed=0):
  torch.manual_seed(seed)
  sigmas = registry.get_sigmas(config)
  oracle = TorchDDPM(
      nf=config.model.nf, ch_mult=tuple(config.model.ch_mult),
      num_res_blocks=config.model.num_res_blocks,
      attn_resolutions=tuple(config.model.attn_resolutions),
      image_size=config.data.image_size,
      channels=config.data.num_channels,
      resamp_with_conv=config.model.resamp_with_conv,
      dropout=config.model.dropout, centered=config.data.centered,
      scale_by_sigma=config.model.scale_by_sigma, sigmas=sigmas)
  oracle.eval()
  params = torch_port.ddpm_params_from_torch_state_dict(
      oracle.state_dict(), config)
  return oracle, ddpm_lib.DDPM(config), params


def _compare(oracle, model, params, config, labels, atol=1e-5, rtol=1e-4):
  rng = np.random.RandomState(42)
  B = int(labels.shape[0])
  x_nhwc = rng.uniform(-1, 1, (B, config.data.image_size,
                               config.data.image_size,
                               config.data.num_channels)).astype(np.float32)
  with torch.no_grad():
    out_t = oracle(torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)),
                   torch.from_numpy(labels)).numpy()
  out_j = model.apply({'params': params}, jnp.asarray(x_nhwc),
                      jnp.asarray(labels), train=False)
  np.testing.assert_allclose(np.asarray(out_j).transpose(0, 3, 1, 2), out_t,
                             rtol=rtol, atol=atol)


def test_ddpm_converted_forward_matches_torch():
  config = _parity_config()
  oracle, model, params = _oracle_and_flax(config)
  # Continuous-VP style float labels (t * 999).
  labels = np.asarray([13.7, 981.2], np.float32)
  _compare(oracle, model, params, config, labels)


def test_ddpm_converted_forward_scale_by_sigma():
  config = _parity_config(scale_by_sigma=True)
  oracle, model, params = _oracle_and_flax(config, seed=1)
  labels = np.asarray([0, config.model.num_scales - 1], np.int32)
  # Dividing by sigma_min (~1e-2) amplifies the shared ~1e-7 accumulation
  # noise ~100x; tolerance scales with it.
  _compare(oracle, model, params, config, labels, atol=1e-4, rtol=1e-3)


def test_param_tree_structure_matches_init():
  """Converted tree must be loadable exactly where init_model's params go."""
  config = _parity_config()
  _, _, params = _oracle_and_flax(config)
  _, variables = registry.init_model(jax.random.PRNGKey(0), config)
  ref = variables['params']
  assert (jax.tree_util.tree_structure(jax.tree_util.tree_map(lambda x: 0,
                                                              params))
          == jax.tree_util.tree_structure(
              jax.tree_util.tree_map(lambda x: 0, ref)))
  for (ka, a), (kb, b) in zip(
      jax.tree_util.tree_leaves_with_path(params),
      jax.tree_util.tree_leaves_with_path(ref)):
    assert ka == kb and a.shape == b.shape, (ka, a.shape, kb, b.shape)


def test_full_checkpoint_conversion_with_ema():
  config = _parity_config()
  oracle, _, params = _oracle_and_flax(config)
  sd = oracle.state_dict()
  ckpt = {
      'info': 1,
      'optimizer': {},
      'model': sd,
      'ema': {'decay': 0.999, 'num_updates': 10,
              'shadow_params': [2.0 * p for p in oracle.parameters()]},
      'step': 1234,
  }
  state = torch_port.convert_reference_checkpoint(ckpt, config)
  assert int(state.step) == 1234
  jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
      state.params, params)
  # Shadow substitution preserves parameter order: EMA == 2 * params leafwise.
  jax.tree_util.tree_map(
      lambda e, p: np.testing.assert_allclose(e, 2.0 * p, rtol=1e-6),
      state.ema_params, state.params)


def test_unconsumed_keys_raise():
  config = _parity_config()
  oracle, _, _ = _oracle_and_flax(config)
  sd = dict(oracle.state_dict())
  sd['all_modules.999.weight'] = torch.zeros(1)
  with pytest.raises(ValueError, match='not consumed'):
    torch_port.ddpm_params_from_torch_state_dict(sd, config)


def test_dual_optimizer_checkpoint_rejected():
  config = _parity_config()
  with pytest.raises(ValueError, match='dual-optimizer'):
    torch_port.convert_reference_checkpoint(
        {'info': 0, 'model': {}}, config)


def test_mlp_converted_forward_matches_torch():
  config = tiny_configs.tiny_mlp_config()
  C, H = config.data.num_channels, config.data.image_size
  L = C * H * H
  shape = (1, 3, 3, 1)

  class TorchMLP(torch.nn.Module):
    """Reference MLP (models/ddpm.py:187-202) checkpoint-key twin."""

    def __init__(self):
      super().__init__()
      seq = torch.nn.Sequential()
      for i in range(len(shape) - 1):
        seq.add_module(f'fc{i}', torch.nn.Linear(L * shape[i],
                                                 L * shape[i + 1]))
      self.nn = seq

    def forward(self, x):  # x: NCHW
      h = x.reshape(-1, L)
      for i, m in enumerate(self.nn):
        h = m(h)
        if i != len(self.nn) - 1:
          h = torch.relu(h)
      return h.reshape(-1, C, H, H)

  torch.manual_seed(3)
  oracle = TorchMLP().eval()
  params = torch_port.mlp_params_from_torch_state_dict(
      oracle.state_dict(), config, shape)
  model = ddpm_lib.MLP(config, shape=shape)

  rng = np.random.RandomState(7)
  x_nhwc = rng.randn(4, H, H, C).astype(np.float32)
  with torch.no_grad():
    out_t = oracle(torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2))).numpy()
  out_j = model.apply({'params': params}, jnp.asarray(x_nhwc),
                      jnp.zeros((4,)), train=False)
  np.testing.assert_allclose(np.asarray(out_j).transpose(0, 3, 1, 2), out_t,
                             rtol=1e-4, atol=1e-5)


def test_dataparallel_wrapped_checkpoint_converts():
  """Real reference checkpoints are saved from a torch.nn.DataParallel-
  wrapped model (reference models/utils.py:93, utils.py:116), so every key
  is 'module.'-prefixed — the converter must strip it."""
  config = _parity_config()
  oracle, model, params_direct = _oracle_and_flax(config)
  wrapped = torch.nn.DataParallel(oracle)
  sd = wrapped.state_dict()
  assert all(k.startswith('module.') for k in sd), list(sd)[:2]

  params = torch_port.ddpm_params_from_torch_state_dict(sd, config)
  jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_array_equal(a, b),
      params, params_direct)

  ckpt = {'info': 1, 'model': sd,
          'ema': {'decay': 0.999, 'num_updates': 5,
                  'shadow_params': [p.detach().clone()
                                    for p in wrapped.parameters()]},
          'step': 7}
  state = torch_port.convert_reference_checkpoint(ckpt, config)
  assert int(state.step) == 7
  jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_array_equal(a, b),
      state.ema_params, params_direct)


def test_full_checkpoint_conversion_mlp_dispatch():
  """convert_reference_checkpoint must route 'mlp' configs through the MLP
  converter (the DDPM all_modules walk would KeyError)."""
  config = tiny_configs.tiny_mlp_config()
  L = config.data.num_channels * config.data.image_size ** 2
  shape = (1, 3, 3, 1)
  seq = torch.nn.Sequential()
  for i in range(len(shape) - 1):
    seq.add_module(f'fc{i}', torch.nn.Linear(L * shape[i], L * shape[i + 1]))

  class Holder(torch.nn.Module):
    def __init__(self):
      super().__init__()
      self.nn = seq

  torch.manual_seed(5)
  holder = Holder()
  ckpt = {'info': 1, 'model': holder.state_dict(), 'step': 42}
  state = torch_port.convert_reference_checkpoint(ckpt, config)
  assert int(state.step) == 42
  assert set(state.params) == {f'Dense_{i}' for i in range(3)}
