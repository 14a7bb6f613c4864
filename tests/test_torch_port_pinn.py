"""PINN dual-optimizer checkpoint-converter parity tests
(torch_port.pinn_params_from_torch_state_dict /
convert_reference_pinn_checkpoint).

An independent NCHW torch PINN oracle (tests/torch_pinn_oracle.py) with
reference state-dict keys is converted to flax params; the NHWC flax PINN
must reproduce the full cascaded-flow pyramid AND the pressure head.  This
closes the ``info == 0`` migration layout (reference utils.py:48-54:
'model'/'ema'/'step'/'optimizer_1'/'optimizer_2') that
convert_reference_checkpoint explicitly rejects.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from b_pinn_kalman_filter_tpu.models import torch_port
from b_pinn_kalman_filter_tpu.pinn import pinn as pinn_mod
from tests.test_pinn import tiny_pinn_config
from tests.torch_pinn_oracle import TorchPINN


def _batch(config, seed=7):
  B, H = 2, config.data.image_size
  rng = np.random.RandomState(seed)
  f1 = rng.uniform(-1, 1, (B, H, H, 1)).astype(np.float32)
  f2 = rng.uniform(-1, 1, (B, H, H, 1)).astype(np.float32)
  xy = np.linspace(0, 1, H, dtype=np.float32)
  x = np.broadcast_to(xy[None, None, :, None], (B, H, H, 1)).copy()
  y = np.broadcast_to(xy[None, :, None, None], (B, H, H, 1)).copy()
  t = rng.uniform(0, 1, (B,)).astype(np.float32)
  return f1, f2, x, y, t


def _to_nchw(a):
  return torch.from_numpy(a.transpose(0, 3, 1, 2))


def test_pinn_forward_parity():
  config = tiny_pinn_config()
  torch.manual_seed(0)
  oracle = TorchPINN(config).eval()
  params = torch_port.pinn_params_from_torch_state_dict(
      oracle.state_dict(), config)

  model = pinn_mod.PINN(config)
  f1, f2, x, y, t = _batch(config)
  with torch.no_grad():
    flow_t, pres_t = oracle(_to_nchw(f1), _to_nchw(f2), _to_nchw(x),
                            _to_nchw(y), torch.from_numpy(t))
  flow_j, pres_j = model.apply(
      {'params': params}, jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(x),
      jnp.asarray(y), jnp.asarray(t), train=False)

  assert len(flow_j) == len(flow_t) == len(config.model.feature_nums) + 1
  for lvl, (fj, ft) in enumerate(zip(flow_j, flow_t)):
    np.testing.assert_allclose(
        np.asarray(fj).transpose(0, 3, 1, 2), ft.numpy(),
        rtol=1e-3, atol=1e-4, err_msg=f'cascade level {lvl}')
  np.testing.assert_allclose(np.asarray(pres_j).transpose(0, 3, 1, 2),
                             pres_t.numpy(), rtol=1e-3, atol=1e-4)


def test_pinn_full_checkpoint_conversion_info0():
  """The info=0 dual-optimizer payload: params, EMA shadows (parameters()
  order — the unused coarsest flow_upsample IS a parameter and must stay in
  the zip), step; optimizer_1/2 dropped for a fresh dual-LR optimizer."""
  config = tiny_pinn_config()
  torch.manual_seed(1)
  oracle = TorchPINN(config).eval()
  shadows = [p.detach() + 0.125 for p in oracle.parameters()]
  ckpt = {'info': 0, 'model': oracle.state_dict(),
          'ema': {'decay': 0.999, 'num_updates': 3,
                  'shadow_params': shadows},
          'step': 77, 'optimizer_1': None, 'optimizer_2': None}
  state = torch_port.convert_reference_pinn_checkpoint(ckpt, config)
  assert int(state.step) == 77

  direct = torch_port.pinn_params_from_torch_state_dict(
      oracle.state_dict(), config)
  jax.tree_util.tree_map(np.testing.assert_array_equal, state.params, direct)
  k = state.params['pressurenet']['Conv_1']['kernel']
  ek = state.ema_params['pressurenet']['Conv_1']['kernel']
  np.testing.assert_allclose(np.asarray(ek), np.asarray(k) + 0.125,
                             atol=1e-6)
  # The dual-LR optimizer accepted the converted tree (flownet /
  # pressurenet labels resolve).
  assert state.opt_state is not None


def test_pinn_converter_rejects_wrong_layout():
  config = tiny_pinn_config()
  with pytest.raises(ValueError, match='info'):
    torch_port.convert_reference_pinn_checkpoint(
        {'info': 1, 'model': {}}, config)
  config.model.arch = 'liteflownet'
  with pytest.raises(ValueError, match="arch='flownet'"):
    torch_port.pinn_params_from_torch_state_dict({}, config)
