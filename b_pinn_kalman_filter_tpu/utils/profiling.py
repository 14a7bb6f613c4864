"""Tracing / profiling / NaN-debugging utilities (SURVEY §5).

The reference has only throttled prints and ad-hoc NaN guards
(reference utils.py:7-23, losses.py:226-231); these are the first-class
equivalents: jax.profiler traces, block-until-ready timers, global NaN
debugging, and pytree finite-checks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Optional

import jax
import numpy as np
from absl import logging


def enable_nan_debugging(enable: bool = True):
  """Raise on any NaN produced inside jitted code
  (reference ad-hoc guards, losses.py:226-231, :361-366)."""
  jax.config.update("jax_debug_nans", enable)


def check_for_nans(params: Any, name: str = 'params') -> bool:
  """True (and logs) if any leaf contains NaN (reference check_for_nans)."""
  bad = False
  for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
    arr = np.asarray(leaf)
    if not np.isfinite(arr).all():
      logging.warning('NaN/inf detected in %s%s', name,
                      jax.tree_util.keystr(path))
      bad = True
  return bad


@contextlib.contextmanager
def trace(logdir: str):
  """jax.profiler trace context; inspect with TensorBoard's profile plugin."""
  jax.profiler.start_trace(logdir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, result_holder: Optional[dict] = None):
  """Wall-clock a block, synchronizing outstanding device work."""
  t0 = time.perf_counter()
  yield
  (jax.device_put(0.) + 0).block_until_ready()
  dt = time.perf_counter() - t0
  logging.info('%s: %.4fs', label, dt)
  if result_holder is not None:
    result_holder[label] = dt
