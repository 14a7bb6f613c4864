"""CLI surface tests: drive the real `main.py` entry point via subprocess.

The reference exposes everything through `python main.py --config ...
--workdir ... --mode ...` (reference main.py:31-67, README usage); every
other test here calls the driver libraries directly, so this file is the
only coverage of the flag surface itself — absl flag parsing, the
ml_collections `--config.section.key=value` override path, mode dispatch,
and workdir logging setup.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAIN = os.path.join(REPO, "main.py")
CONFIG = os.path.join(
    REPO, "b_pinn_kalman_filter_tpu", "configs", "vp",
    "cifar10_ddpmpp_continuous.py")

# Tiny-MLP overrides mirroring tests/tiny_configs.tiny_mlp_config, passed
# through the reference's documented `--config.x.y=z` override mechanism.
TINY_OVERRIDES = [
    "--config.model.name=mlp",
    "--config.model.scale_by_sigma=False",
    "--config.data.image_size=8",
    "--config.data.num_channels=1",
    "--config.training.batch_size=8",
    "--config.eval.batch_size=8",
    "--config.model.nf=8",
    "--config.model.ch_mult=(1,2)",
    "--config.model.num_res_blocks=1",
    "--config.model.attn_resolutions=(4,)",
    "--config.model.num_scales=5",
    "--config.optim.warmup=2",
]


def _run(args, timeout=600):
  env = dict(os.environ)
  env["JAX_PLATFORMS"] = "cpu"
  # One virtual device is enough for the smoke run and halves startup cost
  # vs the test process's 8-device mesh.
  env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
  env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
  return subprocess.run([sys.executable, MAIN] + args, env=env,
                        capture_output=True, text=True, timeout=timeout)


def test_cli_train_smoke(tmp_path):
  """`--mode train` end-to-end through the real CLI: flags parse, config
  overrides apply, the loop runs, and the reference's workdir artifacts
  (stdout.txt log, meta checkpoint) appear."""
  workdir = str(tmp_path / "run")
  proc = _run([
      "--config", CONFIG, "--workdir", workdir, "--mode", "train",
      "--config.training.n_iters=2",
      "--config.training.snapshot_freq=2",
      "--config.training.snapshot_freq_for_preemption=2",
      "--config.training.eval_freq=2",
      "--config.training.log_freq=1",
      "--config.training.snapshot_sampling=False",
  ] + TINY_OVERRIDES)
  assert proc.returncode == 0, proc.stderr[-2000:]
  # Reference workdir layout: stdout.txt log + preemption meta checkpoint.
  assert os.path.exists(os.path.join(workdir, "stdout.txt"))
  assert os.path.exists(
      os.path.join(workdir, "checkpoints-meta", "checkpoint"))


def test_cli_rejects_missing_required_flags(tmp_path):
  """absl marks --workdir/--config/--mode required (reference main.py:38)."""
  proc = _run(["--workdir", str(tmp_path)], timeout=120)
  assert proc.returncode != 0
  err = (proc.stderr + proc.stdout).lower()
  assert "config" in err or "mode" in err
