"""PINN / B-PINN visual evaluation (reference: pinn_kalman/pinn_lib.py
__main__ demo, :260-343): side-by-side predicted u/v/p vs targets plus
B-PINN uncertainty maps.

  PYTHONPATH=. python examples/pinn_eval_demo.py \
      [--config <cfg.py>] [--ckptdir <pinn ckpt>] [--outdir ./pinn_eval]
"""

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
  # The session's PJRT plugin ignores the env var; honor it explicitly.
  jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
import numpy as np


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--config', default=None)
  ap.add_argument('--ckptdir', default=None)
  ap.add_argument('--outdir', default='./pinn_eval')
  args = ap.parse_args()

  if args.config:
    spec = importlib.util.spec_from_file_location('cfg', args.config)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    config = mod.get_config()
  else:
    from b_pinn_kalman_filter_tpu import configs
    config = configs.get_config("pinn/pinn_pde")
    config.data.image_size = 32
    config.model.feature_nums = [8, 16, 32]
    config.training.batch_size = 2

  from b_pinn_kalman_filter_tpu.data import get_dataset
  from b_pinn_kalman_filter_tpu.pinn import bayes
  from b_pinn_kalman_filter_tpu.pinn.pinn_lib import init_pinn, unbatch
  from b_pinn_kalman_filter_tpu.utils.misc import save_image_grid

  rng = jax.random.PRNGKey(0)
  model, variables = init_pinn(config, rng)
  params = variables['params']
  if args.ckptdir:
    from b_pinn_kalman_filter_tpu.pinn import losses as pinn_losses
    from b_pinn_kalman_filter_tpu.train import checkpoint as ckpt_lib
    from b_pinn_kalman_filter_tpu.train import state as state_lib
    tx = pinn_losses.get_pinn_optimizer(config)
    template = state_lib.create_train_state(params, tx, config.model.ema_rate)
    params = ckpt_lib.restore_checkpoint(args.ckptdir, template).ema_params

  _, test_ds = get_dataset(config)
  f1, f2, x, y, t, target = unbatch(next(iter(test_ds)))

  flow, pres = model.apply({'params': params}, f1, f2, x, y, t, train=False)
  bp = bayes.make_bpinn_params(params, config, pretrained=True)
  out = bayes.predict(jax.random.PRNGKey(1), model, bp, f1, f2, x, y, t,
                      dt=config.data.dt, n=8)
  flow_m, pres_m, f_m, flow_s, pres_s, f_s = out

  def norm(img):
    img = np.asarray(img)
    lo, hi = img.min(), img.max()
    return (img - lo) / (hi - lo + 1e-8)

  panels = [
      norm(flow[-1][..., 0:1]), norm(target[..., 0:1]),   # u pred vs gt
      norm(flow[-1][..., 1:2]), norm(target[..., 1:2]),   # v pred vs gt
      norm(pres), norm(target[..., 2:3]),                 # p pred vs gt
      norm(flow_s[..., 0:1]), norm(pres_s),               # uncertainties
  ]
  grid = np.concatenate([p[0:1] for p in panels], axis=0)
  os.makedirs(args.outdir, exist_ok=True)
  save_image_grid(grid, os.path.join(args.outdir, 'pinn_eval.png'), nrow=2)
  for name, pred, ch in (('u', flow[-1][..., 0], 0), ('v', flow[-1][..., 1], 1),
                         ('p', pres[..., 0], 2)):
    mse = float(jnp.mean((pred - target[..., ch]) ** 2))
    print(f"{name} MSE: {mse:.5f}")
  print(f"wrote {args.outdir}/pinn_eval.png")


if __name__ == '__main__':
  main()
