"""Shared backend predicate for Pallas-kernel dispatch sites.

Every opt-in TPU kernel (winograd conv, fused GroupNorm) must use the SAME
predicate, so a PJRT plugin reporting an unusual platform name (the axon
tunnel reports 'axon', not 'tpu') cannot make one kernel dispatch while the
other silently no-ops (ADVICE r2, models/layers.py:97 vs ops/winograd.py:181).
"""

import jax


def is_tpu_backend() -> bool:
  """True when the default backend is a TPU (including tunneled plugins).

  CPU and GPU are the only backends where the Pallas TPU kernels cannot
  run; any other platform name (``tpu``, ``axon``, ...) is treated as TPU.
  """
  return jax.default_backend() not in ('cpu', 'gpu')
