"""Class-conditional NCSN (v1) checkpoint-converter parity tests
(torch_port.ncsn_params_from_torch_state_dict) — completes converter
coverage of every registered score-model family (ddpm, mlp, ncsnpp,
ncsnv2_64/128/256, ncsn).

The reference's own NCSN v1 cannot even be constructed (``dilation=None``
TypeErrors, layers.py:384,392, on top of the padding-under-dilation bug) —
parity targets the functional convention whose state-dict layout is
identical (tests/torch_ncsnv2_oracle.py docstrings).
"""

import jax.numpy as jnp
import numpy as np
import torch

from b_pinn_kalman_filter_tpu.models import ncsnv2 as ncsnv2_lib
from b_pinn_kalman_filter_tpu.models import torch_port
from tests.tiny_configs import tiny_ddpm_config
from tests.torch_ncsnv2_oracle import TorchNCSN


def _config(image_size=16, nf=8):
  config = tiny_ddpm_config()
  config.model.name = 'ncsn'
  config.model.normalization = 'InstanceNorm++'
  config.model.nonlinearity = 'elu'
  config.model.scale_by_sigma = False
  config.model.num_scales = 8
  config.model.num_classes = 8   # = num_scales (reference ncsnv2.py:150)
  config.data.image_size = image_size
  config.model.nf = nf
  return config


def _parity(config, seed=0, atol=1e-4, rtol=1e-3):
  torch.manual_seed(seed)
  oracle = TorchNCSN(config).eval()
  params = torch_port.ncsn_params_from_torch_state_dict(
      oracle.state_dict(), config)
  model = ncsnv2_lib.NCSN(config)

  rng = np.random.RandomState(11)
  B = 2
  x = rng.uniform(0.05, 0.95, (B, config.data.image_size,
                               config.data.image_size,
                               config.data.num_channels)).astype(np.float32)
  y = np.arange(B) % config.model.num_scales
  with torch.no_grad():
    out_t = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(y)).numpy()
  out_j = model.apply({'params': params}, jnp.asarray(x), jnp.asarray(y),
                      train=False)
  np.testing.assert_allclose(np.asarray(out_j).transpose(0, 3, 1, 2), out_t,
                             rtol=rtol, atol=atol)


def test_ncsn_conditional_parity():
  _parity(_config(image_size=16, nf=8))


def test_ncsn_conditional_parity_28_adjust_padding():
  """The 28px MNIST topology with adjust_padding in res4 (reference
  ncsnv2.py:172-178)."""
  _parity(_config(image_size=28, nf=4))


def test_ncsn_full_checkpoint_conversion():
  """convert_reference_checkpoint dispatches 'ncsn' and substitutes the
  EMA shadows (embedding norms are ordinary parameters, so they appear in
  the parameters()-order shadow list like everything else)."""
  import jax
  config = _config(image_size=16, nf=8)
  torch.manual_seed(2)
  oracle = TorchNCSN(config).eval()
  shadows = [p.detach() + 0.5 for p in oracle.parameters()]
  ckpt = {'info': 1, 'model': oracle.state_dict(),
          'ema': {'decay': 0.999, 'num_updates': 4,
                  'shadow_params': shadows},
          'step': 42, 'optimizer': None}
  state = torch_port.convert_reference_checkpoint(ckpt, config)
  assert int(state.step) == 42
  direct = torch_port.ncsn_params_from_torch_state_dict(
      oracle.state_dict(), config)
  jax.tree_util.tree_map(np.testing.assert_array_equal, state.params, direct)
  emb = state.params['ConditionalInstanceNorm2dPlus_0']['Embed_0']['embedding']
  eemb = state.ema_params[
      'ConditionalInstanceNorm2dPlus_0']['Embed_0']['embedding']
  np.testing.assert_allclose(np.asarray(eemb), np.asarray(emb) + 0.5,
                             atol=1e-6)
