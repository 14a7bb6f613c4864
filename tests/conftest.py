"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU with 8 virtual devices (the standard fake-backend trick for
exercising pjit/shard_map without TPUs; SURVEY §4f).  Must set XLA flags
before jax is imported anywhere.
"""

import os
import sys

# Force CPU: the session env pins JAX_PLATFORMS to the TPU tunnel ('axon'),
# but unit tests must run on an 8-device virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The session's PJRT plugin ('axon') force-prepends itself to jax_platforms,
# ignoring the env var — override at the config level before devices init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
