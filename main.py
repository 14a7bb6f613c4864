"""CLI entry point (reference: main.py).

Same flag surface as the reference:
  python main.py --config <config.py> --workdir <dir> --mode <mode>
        [--ckptdir <dir>] [--eval_folder <name>]
Modes: train, sample, eval, inverse, train_pinn, train_bpinn, simulate, ukf.
Config overrides via --config.section.key=value work as in the reference
(README usage), courtesy of ml_collections config_flags.
"""

import logging as py_logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# The session's PJRT plugin ('axon') force-prepends itself to jax_platforms
# and ignores the JAX_PLATFORMS env var; honor the env var explicitly so
# CPU-only runs don't contend for the single TPU.
if os.environ.get("JAX_PLATFORMS"):
  jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from absl import app
from absl import flags
from ml_collections.config_flags import config_flags

FLAGS = flags.FLAGS

config_flags.DEFINE_config_file("config", None, "Training configuration.",
                                lock_config=True)
flags.DEFINE_string("workdir", None, "Work directory.")
flags.DEFINE_string("ckptdir", None, "Checkpoint directory.")
flags.DEFINE_enum("mode", None,
                  ["train", "sample", "eval", "inverse",
                   "train_pinn", "train_bpinn", "simulate", "ukf"],
                  "Running mode.")
flags.DEFINE_string("eval_folder", "eval",
                    "The folder name for storing evaluation results")
flags.mark_flags_as_required(["workdir", "config", "mode"])


def _setup_logging(workdir):
  os.makedirs(workdir, exist_ok=True)
  gfile_stream = open(os.path.join(workdir, 'stdout.txt'), 'w')
  handler = py_logging.StreamHandler(gfile_stream)
  formatter = py_logging.Formatter(
      '%(levelname)s - %(filename)s - %(asctime)s - %(message)s')
  handler.setFormatter(formatter)
  logger = py_logging.getLogger()
  logger.addHandler(handler)
  logger.setLevel('INFO')


def main(argv):
  from b_pinn_kalman_filter_tpu.train import run_lib

  if FLAGS.mode == "train":
    _setup_logging(FLAGS.workdir)
    run_lib.train(FLAGS.config, FLAGS.workdir)
  elif FLAGS.mode == "eval":
    run_lib.evaluate(FLAGS.config, FLAGS.workdir, FLAGS.eval_folder)
  elif FLAGS.mode == "sample":
    run_lib.sample(FLAGS.config, FLAGS.ckptdir, FLAGS.workdir)
  elif FLAGS.mode == "inverse":
    from b_pinn_kalman_filter_tpu.inverse import inverse_lib
    inverse_lib.inverse(FLAGS.config, FLAGS.ckptdir, FLAGS.workdir)
  elif FLAGS.mode == "train_pinn":
    from b_pinn_kalman_filter_tpu.pinn import pinn_lib
    _setup_logging(FLAGS.workdir)
    pinn_lib.train(FLAGS.config, FLAGS.workdir)
  elif FLAGS.mode == "train_bpinn":
    from b_pinn_kalman_filter_tpu.pinn import pinn_lib
    _setup_logging(FLAGS.workdir)
    pinn_lib.train_bpinn(FLAGS.config, FLAGS.workdir, FLAGS.ckptdir)
  elif FLAGS.mode == "simulate":
    from b_pinn_kalman_filter_tpu.kalman import simulator
    simulator.run(FLAGS.config, FLAGS.ckptdir, FLAGS.workdir)
  elif FLAGS.mode == "ukf":
    from b_pinn_kalman_filter_tpu.kalman import ukf_lib
    ukf_lib.run(FLAGS.config, FLAGS.ckptdir, FLAGS.workdir)
  else:
    raise ValueError(f"Mode {FLAGS.mode} not recognized.")


if __name__ == "__main__":
  app.run(main)
