"""NCSNv2 reference-checkpoint converter parity tests
(torch_port.ncsnv2_params_from_torch_state_dict).

An independent NCHW torch oracle (tests/torch_ncsnv2_oracle.py) with
reference state-dict keys is converted to flax params; the NHWC flax model
must reproduce its outputs.  Covers all three size-dispatched variants
(reference models/ncsnv2.py:31-40), the adjust_padding=28px MNIST path,
and the EMA-shadow substitution + full-checkpoint conversion.

Note the reference's own NCSNv2 modules cannot run forward at all (the
``padding=1``-under-dilation bug, see torch_ncsnv2_oracle.py docstring);
parity is against the functional ``padding=dilation`` convention, whose
state-dict layout is identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from b_pinn_kalman_filter_tpu.models import ncsnv2 as ncsnv2_lib
from b_pinn_kalman_filter_tpu.models import registry, torch_port
from tests.tiny_configs import tiny_ddpm_config
from tests.torch_ncsnv2_oracle import TorchNCSNv2


def _config(image_size=16, nf=8):
  config = tiny_ddpm_config()
  config.model.normalization = 'InstanceNorm++'
  config.model.nonlinearity = 'elu'
  config.model.scale_by_sigma = True
  config.model.num_scales = 8
  config.data.image_size = image_size
  config.model.nf = nf
  if image_size < 96:
    config.model.name = 'ncsnv2_64'
  elif image_size <= 128:
    config.model.name = 'ncsnv2_128'
  else:
    config.model.name = 'ncsnv2_256'
  return config


def _parity(config, seed=0, atol=1e-4, rtol=1e-3, batch=2):
  torch.manual_seed(seed)
  sigmas = registry.get_sigmas(config)
  oracle = TorchNCSNv2(config, sigmas).eval()
  params = torch_port.ncsnv2_params_from_torch_state_dict(
      oracle.state_dict(), config)
  model = ncsnv2_lib.get_network(config)()

  rng = np.random.RandomState(7)
  x = rng.uniform(0.05, 0.95, (batch, config.data.image_size,
                               config.data.image_size,
                               config.data.num_channels)).astype(np.float32)
  y = np.arange(batch) % config.model.num_scales
  with torch.no_grad():
    out_t = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(y)).numpy()
  out_j = model.apply({'params': params}, jnp.asarray(x), jnp.asarray(y),
                      train=False)
  np.testing.assert_allclose(np.asarray(out_j).transpose(0, 3, 1, 2), out_t,
                             rtol=rtol, atol=atol)
  return oracle, params


def test_ncsnv2_64_parity():
  _parity(_config(image_size=16, nf=8))


def test_ncsnv2_64_adjust_padding_28():
  """The 28px (MNIST) topology.  Note adjust_padding=True is passed to
  res4 there (reference ncsnv2.py:80-87) but res4 has dilation=4, and the
  reference ResidualBlock only consults adjust_padding in its dilation==1
  'down' branch (layers.py:448-457) — so no real checkpoint ever contains
  the ZeroPad2d '.conv.1' keys; this pins the 28px parity, and the
  converter's '.conv.1' mapping is defensive-only."""
  _parity(_config(image_size=28, nf=4))


def test_ncsnv2_128_parity():
  _parity(_config(image_size=96, nf=4))


def test_ncsnv2_256_parity():
  """The refine31-between-refine2-and-refine3 forward-order subtlety
  (reference ncsnv2.py:401-406)."""
  _parity(_config(image_size=160, nf=4), batch=1)


def test_ncsnv2_full_checkpoint_conversion():
  """convert_reference_checkpoint on an info=1 NCSNv2 payload: params AND
  EMA-shadow substitution (state-dict order minus the sigmas buffer)."""
  config = _config(image_size=16, nf=8)
  torch.manual_seed(1)
  sigmas = registry.get_sigmas(config)
  oracle = TorchNCSNv2(config, sigmas).eval()

  # EMA shadows: perturbed copies of the parameters, in parameters() order.
  shadows = [p.detach() + 0.25 for p in oracle.parameters()]
  ckpt = {'info': 1, 'model': oracle.state_dict(),
          'ema': {'decay': 0.999, 'num_updates': 10,
                  'shadow_params': shadows},
          'step': 1234, 'optimizer': None}
  state = torch_port.convert_reference_checkpoint(ckpt, config)
  assert int(state.step) == 1234

  # params match a direct conversion; ema_params differ by the perturbation.
  direct = torch_port.ncsnv2_params_from_torch_state_dict(
      oracle.state_dict(), config)
  jax.tree_util.tree_map(np.testing.assert_array_equal, state.params, direct)
  kern = state.params['NCSNConv_0']['Conv_0']['kernel']
  ekern = state.ema_params['NCSNConv_0']['Conv_0']['kernel']
  np.testing.assert_allclose(np.asarray(ekern), np.asarray(kern) + 0.25,
                             atol=1e-6)
