"""Config registry: ml_collections configs with the reference schema.

Reference configs (reference: configs/*) map 1:1 onto these modules, so a user
of the reference can point ``--config`` at the same relative path.  Extra
TPU-only knobs live under ``config.tpu`` and have defaults, so reference
configs remain valid.

Usage:
    from b_pinn_kalman_filter_tpu import configs
    cfg = configs.get_config("vp/cifar10_ddpmpp_continuous")
"""

import importlib


def get_config(name: str):
  """Load a config by its reference-style relative path (no .py suffix)."""
  if name.endswith(".py"):
    name = name[:-3]
  name = name.replace("/", ".")
  mod = importlib.import_module(f"{__name__}.{name}")
  return mod.get_config()
