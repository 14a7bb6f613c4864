"""Sampling demo from a checkpoint (reference: Sample.ipynb).

  PYTHONPATH=. python examples/sample_demo.py --config <cfg.py> \
      --ckptdir <workdir/checkpoints/checkpoint_N> --outdir ./samples
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


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--config', required=True)
  ap.add_argument('--ckptdir', required=True)
  ap.add_argument('--outdir', default='./samples_out')
  args = ap.parse_args()

  spec = importlib.util.spec_from_file_location('cfg', args.config)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  config = mod.get_config()

  from b_pinn_kalman_filter_tpu.train import run_lib
  samples, n = run_lib.sample(config, args.ckptdir, args.outdir)
  print(f"wrote {args.outdir}/sample.png (nfe {int(n)})")


if __name__ == '__main__':
  main()
