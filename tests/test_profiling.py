"""utils/profiling.py — the SURVEY §5 tracing/NaN-guard equivalents
(reference utils.py:7-23 Clock/show_memory_usage, losses.py:226-231
check_for_nans)."""

import jax
import jax.numpy as jnp
import numpy as np

from b_pinn_kalman_filter_tpu.utils import profiling


def test_check_for_nans_detects_and_passes():
  clean = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2, 2))}}
  assert not profiling.check_for_nans(clean)
  dirty = {"a": jnp.ones((3,)),
           "b": {"c": jnp.array([1.0, np.nan])}}
  assert profiling.check_for_nans(dirty)
  infs = {"a": jnp.array([np.inf])}
  assert profiling.check_for_nans(infs)


def test_timed_records_wall_clock():
  holder = {}
  with profiling.timed("block", holder):
    _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
  assert holder["block"] > 0.0


def test_enable_nan_debugging_toggles_jax_config():
  try:
    profiling.enable_nan_debugging(True)
    assert jax.config.jax_debug_nans
  finally:
    profiling.enable_nan_debugging(False)
  assert not jax.config.jax_debug_nans


def test_trace_writes_profile(tmp_path):
  logdir = str(tmp_path / "trace")
  with profiling.trace(logdir):
    jnp.ones((4,)).sum().block_until_ready()
  import os
  found = [f for _, _, fs in os.walk(logdir) for f in fs]
  assert found  # profiler dumped something inspectable
