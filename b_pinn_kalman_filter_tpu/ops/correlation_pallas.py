"""Pallas TPU kernel: FlowNet correlation cost volume (stride 1).

One program per batch row keeps f1 and the zero-padded f2 resident in VMEM
and emits all 49 displacement channels without HBM round-trips between the
shifted products (the XLA path materializes intermediate slices).
Numerics shared with ops/correlation.py; stride>1 falls back to XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
  from jax.experimental.pallas import tpu as pltpu
  _HAVE_TPU_PALLAS = True
except ImportError:  # pragma: no cover
  _HAVE_TPU_PALLAS = False

from b_pinn_kalman_filter_tpu.ops.correlation import correlation as xla_correlation

_D = 3


def _corr_kernel(f1_ref, f2_ref, out_ref):
  f1 = f1_ref[0]                       # (H, W, C)
  f2 = f2_ref[0]
  H, W, C = f1.shape
  pad = _D
  f2p = jnp.pad(f2, ((pad, pad), (pad, pad), (0, 0)))
  k = 0
  for dy in range(-_D, _D + 1):
    for dx in range(-_D, _D + 1):
      shifted = f2p[pad + dy: pad + dy + H, pad + dx: pad + dx + W, :]
      out_ref[0, :, :, k] = jnp.mean(f1 * shifted, axis=-1)
      k += 1


def correlation_pallas(f1, f2, stride: int = 1, interpret: bool = False):
  """Pallas correlation; stride must be 1 (XLA fallback otherwise)."""
  assert stride == 1
  B, H, W, C = f1.shape
  in_spec = pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM if (_HAVE_TPU_PALLAS and
                                                     not interpret) else None)
  out_spec = pl.BlockSpec((1, H, W, 49), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM if (_HAVE_TPU_PALLAS and
                                                      not interpret) else None)
  return pl.pallas_call(
      _corr_kernel,
      grid=(B,),
      in_specs=[in_spec, in_spec],
      out_specs=out_spec,
      out_shape=jax.ShapeDtypeStruct((B, H, W, 49), f1.dtype),
      interpret=interpret,
  )(f1, f2)


def _vmem_fits(f1) -> bool:
  """Whole-image kernel must fit scoped VMEM (~16MB): inputs + padded f2 +
  the 49-channel output + headroom for live shifted products."""
  B, H, W, C = f1.shape
  bytes_needed = 4 * H * W * (2 * C + 49) + 4 * (H + 6) * (W + 6) * C
  return bytes_needed * 3 < 12 * 2 ** 20


def _under_batching(x) -> bool:
  """True when ``x`` is a vmap tracer at any nesting level.

  vmap's batching rule for ``pallas_call`` folds the mapped axis into the
  block shapes, multiplying the per-program VMEM footprint by the vmap
  width — which ``_vmem_fits`` (trace-time, unbatched shape) cannot see.
  Observed: the B-PINN UKF measurement vmaps the PINN over 8 MC draws and
  the 40.19M blocks blow the 16M scoped-VMEM limit at server-side compile,
  where the ``except Exception`` fallback can no longer catch it
  (chip_logs/ukf.log, advisor round 3).

  Conservative on failure: these are private jax modules (no public
  Tracer alias exists) — if an upgrade moves them, report True so the
  caller takes the always-correct XLA path instead of crashing.  Known
  residual blind spot: ``vmap(jit(f))`` hides the batching trace from
  the inner trace's Python, so that ordering can still reach the Pallas
  path batched; the framework's own call sites vmap directly.
  """
  try:
    from jax._src import core as _core            # no public Tracer alias
    from jax._src.interpreters import batching as _batching
    while isinstance(x, _core.Tracer):
      if isinstance(x, _batching.BatchTracer):
        return True
      x = getattr(x, 'val', getattr(x, 'primal', None))
    return False
  except Exception:
    return True


def correlation_auto(f1, f2, stride: int = 1):
  """Pallas on TPU for stride-1 when the tile fits VMEM; XLA elsewhere
  (including under vmap, where the batched block would not fit)."""
  if (stride == 1 and _HAVE_TPU_PALLAS
      and jax.devices()[0].platform == 'tpu' and _vmem_fits(f1)
      and not (_under_batching(f1) or _under_batching(f2))):
    try:
      return correlation_pallas(f1, f2, stride)
    except Exception:
      pass
  return xla_correlation(f1, f2, stride)
