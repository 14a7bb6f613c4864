"""Shared backend predicate for Pallas-kernel dispatch sites.

Every opt-in TPU kernel (winograd conv, fused GroupNorm) must use the SAME
predicate, so a PJRT plugin reporting an unusual platform name (the axon
tunnel reports 'axon', not 'tpu') cannot make one kernel dispatch while the
other silently no-ops (ADVICE r2, models/layers.py:97 vs ops/winograd.py:181).
"""

import jax


_TPU_PLATFORMS = ('tpu', 'axon')


def is_tpu_backend() -> bool:
  """True when the default backend is a TPU (including tunneled plugins).

  An allowlist, not a CPU/GPU denylist: an unknown non-TPU PJRT plugin
  (``METAL``, ``neuron``, ...) must fall back to the XLA paths rather than
  fail compiling a Pallas-TPU kernel it cannot run.  The axon tunnel
  reports platform ``axon`` for a real TPU, hence its presence here.
  """
  return jax.default_backend().lower() in _TPU_PLATFORMS
