"""ctypes bridge to the native C++ NS simulator (csrc/ns_sim.cpp).

Host-side twin of ``ops/ns_step`` (same numerics as the reference CUDA
kernels, reference op/ns_step_kernel.cu): used by the data pipeline to
generate long synthetic NS rollouts on the CPU in parallel with TPU
compute — a 400-frame 200x32-upsampled rollout takes ~0.13 s vs ~100 s
frame-at-a-time through the tunnel (BASELINE.md).

The shared library auto-builds on first use with g++ (OpenMP when
available); all entry points degrade to ``None``/``False`` so callers can
fall back to the jnp stepper (data/datasets._generate_ns_rollout).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     'csrc')
_SO_PATH = os.path.join(_CSRC, 'libns_sim.so')
_SRC_PATH = os.path.join(_CSRC, 'ns_sim.cpp')

_lock = threading.Lock()
_lib = None
_lib_tried = False

_F32P = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')


def _build() -> bool:
  """g++ -O3 [-fopenmp] -shared -fPIC ns_sim.cpp -o libns_sim.so."""
  if not os.path.exists(_SRC_PATH):
    return False
  for flags in (['-fopenmp'], []):  # OpenMP if the toolchain has it
    cmd = ['g++', '-O3', '-march=native', *flags, '-shared', '-fPIC',
           _SRC_PATH, '-o', _SO_PATH]
    try:
      proc = subprocess.run(cmd, capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
      return False
    if proc.returncode == 0:
      return True
  return False


def get_lib() -> Optional[ctypes.CDLL]:
  """Load (building if needed) the native library; None when unavailable."""
  global _lib, _lib_tried
  with _lock:
    if _lib_tried:
      return _lib
    _lib_tried = True
    if not os.path.exists(_SO_PATH) and not _build():
      return None
    try:
      lib = ctypes.CDLL(_SO_PATH)
    except OSError:
      return None
    lib.ns_sim_step.restype = None
    lib.ns_sim_step.argtypes = [_F32P, _F32P, _F32P, _F32P,
                                ctypes.c_int, ctypes.c_int,
                                ctypes.c_float, ctypes.c_float]
    lib.ns_sim_rollout.restype = None
    lib.ns_sim_rollout.argtypes = [_F32P, _F32P, _F32P, _F32P, _F32P,
                                   _F32P, _F32P,
                                   ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_float, ctypes.c_float,
                                   ctypes.c_float, ctypes.c_float]
    _lib = lib
    return _lib


def _as_f32(a: np.ndarray) -> np.ndarray:
  return np.ascontiguousarray(a, np.float32)


def ns_sim_step(dens: np.ndarray, u: np.ndarray, v: np.ndarray,
                p: np.ndarray, dt: float, dx: float) -> bool:
  """One in-place NS step on (h, w) float32 fields.  False if no lib."""
  lib = get_lib()
  if lib is None:
    return False
  h, w = dens.shape
  for a in (dens, u, v, p):
    assert a.shape == (h, w) and a.dtype == np.float32 \
        and a.flags['C_CONTIGUOUS'], 'in-place buffers must be C f32'
  lib.ns_sim_step(dens, u, v, p, h, w, dt, dx)
  return True


def ns_sim_rollout(n_frames: int, dens: np.ndarray, u: np.ndarray,
                   v: np.ndarray, p: np.ndarray, coordx: np.ndarray,
                   coordy: np.ndarray, dt: float, dx: float,
                   vel_damp: float = 0.99,
                   p_damp: float = 0.95) -> Optional[np.ndarray]:
  """Full rollout -> (n_frames, 6, h, w) float32 frames of
  (coordx, coordy, f, u, v, p); None when the native lib is unavailable.

  Damping defaults match the jnp fallback in datasets._generate_ns_rollout
  (long-horizon stability of the explicit scheme).
  """
  lib = get_lib()
  if lib is None:
    return None
  h, w = dens.shape
  dens, u, v, p = (_as_f32(a).copy() for a in (dens, u, v, p))
  coordx, coordy = _as_f32(coordx), _as_f32(coordy)
  out = np.empty((n_frames, 6, h, w), np.float32)
  lib.ns_sim_rollout(out.reshape(-1), dens, u, v, p,
                     coordx, coordy, n_frames, h, w, dt, dx,
                     vel_damp, p_damp)
  return out
