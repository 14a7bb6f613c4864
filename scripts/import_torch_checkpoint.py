"""Import a reference PyTorch checkpoint into this framework's workdir layout.

Converts a ``checkpoint_N.pth`` written by the reference trainer
(reference utils.py:109-128, run_lib.py:164-168) into orbax checkpoints this
framework's drivers restore natively:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/import_torch_checkpoint.py \\
      --config b_pinn_kalman_filter_tpu/configs/vp/cifar10_ddpmpp_continuous.py \\
      --torch_ckpt /path/to/checkpoint_10.pth --workdir ./migrated

Writes ``<workdir>/checkpoints/checkpoint_<step//snapshot_freq>`` and
``<workdir>/checkpoints-meta/checkpoint``, so every mode picks the imported
weights up directly:

  python main.py --config ... --workdir ./migrated --mode train   # resume
  python main.py --config ... --mode sample --ckptdir ./migrated/checkpoints/checkpoint_<k>
  python main.py --config ... --workdir ./migrated --mode eval

Score-model checkpoints convert (``info == 1`` layout) for every registered
family with a converter: ddpm, mlp, ncsnpp, and the ncsnv2_64/128/256
RefineNet models — dispatch is on ``config.model.name``
(models/torch_port.convert_reference_checkpoint).  PINN checkpoints (the
``info == 0`` dual-optimizer layout, reference utils.py:48-54) are detected
from the payload and convert via convert_reference_pinn_checkpoint.  Torch
optimizer moments are layout-coupled and are replaced by a fresh optimizer
state in both cases (see models/torch_port.py docstring).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
  jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from absl import app
from absl import flags
from absl import logging
from ml_collections.config_flags import config_flags

FLAGS = flags.FLAGS

config_flags.DEFINE_config_file("config", None, "Model configuration.",
                                lock_config=True)
flags.DEFINE_string("torch_ckpt", None, "Reference .pth checkpoint path.")
flags.DEFINE_string("workdir", None, "Destination work directory.")
flags.mark_flags_as_required(["config", "torch_ckpt", "workdir"])


def main(argv):
  del argv
  from b_pinn_kalman_filter_tpu.models import torch_port
  from b_pinn_kalman_filter_tpu.train import checkpoint as ckpt_lib

  config = FLAGS.config
  # Dispatch on the saved layout flag (reference utils.py:48-58): info=0 is
  # the dual-optimizer PINN payload, info=1 (or absent) a score model.
  import torch
  ckpt = torch.load(FLAGS.torch_ckpt, map_location="cpu", weights_only=False)
  if ckpt.get("info", 1) == 0:
    state = torch_port.convert_reference_pinn_checkpoint(ckpt, config)
  else:
    state = torch_port.convert_reference_checkpoint(ckpt, config)
  state = jax.device_get(state)
  step = int(state.step)

  meta_path = os.path.join(FLAGS.workdir, "checkpoints-meta", "checkpoint")
  os.makedirs(os.path.dirname(meta_path), exist_ok=True)
  ckpt_lib.save_checkpoint(meta_path, state)

  # Same numbering as the train loop (train/run_lib.py snapshot blocks).
  save_step = step // max(1, config.training.snapshot_freq)
  num_path = os.path.join(ckpt_lib.get_ckptdir(FLAGS.workdir),
                          f"checkpoint_{save_step}")
  ckpt_lib.save_checkpoint(num_path, state)

  logging.info("Imported step-%d reference checkpoint:\n  %s\n  %s",
               step, meta_path, num_path)
  print(f"imported step={step} -> {num_path}")


if __name__ == "__main__":
  app.run(main)
