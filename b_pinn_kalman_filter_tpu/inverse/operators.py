"""Linear observation operators (reference: inverse/operators.py).

TPU-first redesign: the reference materializes explicit (N, N) observation
matrices and row-compacted projections with *data-dependent shapes*
(operators.py:167-197) — poison for XLA.  Here the inpainting operator A is
kept in its diagonal form: ``A x = mask * x``, the ill-posed observation is
the zero-padded flattened vector (same information as the compacted one —
dropped rows are zero in both), and every projection the samplers need
(L^T A y, (I-A) x) reduces to elementwise mask algebra with static shapes.
Explicit matrices remain available via ``to_matrix`` for tests/parity.
"""

from __future__ import annotations

import abc
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def get_operator(config):
  """Operator factory (reference operators.py:8-17).

  The reference factory only dispatches inpainting and leaves its
  GaussianFilter unreachable; we additionally expose it as ``'blur'``
  (kernel size/std from ``config.inverse.blur_kernel``/``blur_std``,
  defaults 9/2.0) — a documented extension beyond reference parity.
  """
  if config.inverse.operator in ('inpaint', 'inpaint_rnd'):
    from b_pinn_kalman_filter_tpu.data import get_mask_dataset
    return InpaintOperator(mask_source=get_mask_dataset(config))
  if config.inverse.operator == 'blur':
    k = int(config.inverse.get('blur_kernel', 9))
    std = float(config.inverse.get('blur_std', 2.0))
    return GaussianFilter((k, k), std)
  raise NotImplementedError


class LinearOperator(abc.ABC):
  """A = pL * T decomposable linear observation operator
  (reference LinearOperators ABC, operators.py:19-58)."""

  @abc.abstractmethod
  def next(self):
    """Advance to the next operator instance (e.g. new random mask)."""

  @abc.abstractmethod
  def __call__(self, x: Array, keep_shape: bool = False, invert: bool = False) -> Array:
    """Apply A.  keep_shape=True: image-shaped masked output;
    keep_shape=False: flattened observation vector (B, C, N)."""

  @abc.abstractmethod
  def to_matrix(self, shape) -> np.ndarray:
    """Explicit matrix form of A (small problems / tests)."""

  def observation_mask(self, y: Array) -> Array:
    """Indicator of live rows in the flattened observation vector.

    The reference's compacted observation (bcmm(pL, x)) has only live rows;
    our zero-padded equivalent must restrict observation-space noise to
    them.  Defaults to all-ones (surjective operators).
    """
    return jnp.ones_like(y)


class ScalerMult(LinearOperator):
  """A = k I (reference operators.py:61-66)."""

  def __init__(self, k: float):
    self.k = float(k)

  def next(self):
    pass

  def __call__(self, x, keep_shape=False, invert=False):
    return self.k * x

  def to_matrix(self, shape):
    n = int(np.prod(shape))
    return self.k * np.eye(n)


class MatrixMult(LinearOperator):
  """Explicit matrix operator (reference operators.py:69-74)."""

  def __init__(self, matrix):
    self.matrix = jnp.asarray(matrix)

  def next(self):
    pass

  def __call__(self, x, keep_shape=False, invert=False):
    B = x.shape[0]
    flat = x.reshape(B, -1, self.matrix.shape[0])
    return jnp.einsum('bcm,mn->bcn', flat, self.matrix)

  def to_matrix(self, shape):
    return np.asarray(self.matrix)


class GaussianFilter(LinearOperator):
  """Gaussian blur operator (reference operators.py:77-123)."""

  def __init__(self, shape: Tuple[int, int], std: float):
    self.kshape = shape
    self.std = float(std)

  def next(self):
    pass

  def get_kernel(self) -> np.ndarray:
    w, h = self.kshape
    xa = np.arange(0, w) - w // 2
    ya = np.arange(0, h) - h // 2
    gx, gy = np.meshgrid(xa, ya)
    kernel = np.exp(-(gx ** 2 + gy ** 2) / (2 * self.std))
    return (kernel / kernel.sum()).astype(np.float32)

  def __call__(self, x, keep_shape=True, invert=False):
    """Symmetric-boundary 'same' convolution (scipy convolve2d semantics)."""
    kernel = jnp.asarray(self.get_kernel())
    kh, kw = kernel.shape
    x2 = x[None, :, :, None] if x.ndim == 2 else x
    ph0, ph1 = (kh - 1) // 2, kh // 2
    pw0, pw1 = (kw - 1) // 2, kw // 2
    x2 = jnp.pad(x2, [(0, 0), (ph0, ph1), (pw0, pw1), (0, 0)], mode='symmetric')
    C = x2.shape[-1]
    w = jnp.flip(kernel, (0, 1)).reshape(kh, kw, 1, 1)
    w = jnp.tile(w, (1, 1, 1, C))
    out = jax.lax.conv_general_dilated(
        x2, w, (1, 1), 'VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=C)
    return out[0, :, :, 0] if x.ndim == 2 else out

  def to_matrix(self, shape) -> np.ndarray:
    """Explicit 'valid' convolution matrix (reference operators.py:98-120)."""
    kernel = self.get_kernel()
    W, H = shape
    kW, kH = kernel.shape
    mW, mH = W - kW + 1, H - kH + 1
    mat = np.zeros((mW * mH, W * H), np.float32)
    for i in range(mW * mH):
      y_offset = i % mH
      x_offset = i // mH
      offset = x_offset * H + y_offset
      for r in range(kW):
        mat[i, r * H + offset: r * H + offset + kH] = kernel[r]
    return mat


class InpaintOperator(LinearOperator):
  """Masking operator A = diag(mask) (reference operators.py:132-203).

  ``mask_source`` provides (H, W, 1) float masks via ``.next()``.
  """

  def __init__(self, mask_source=None, mask: Optional[Array] = None):
    self.mask_source = mask_source
    if mask is not None:
      self.mask = jnp.asarray(mask)
    else:
      self.next()

  def next(self):
    if self.mask_source is not None:
      self.mask = jnp.asarray(self.mask_source.next())

  def _m(self, invert):
    return (1.0 - self.mask) if invert else self.mask

  def __call__(self, x, keep_shape=True, invert=False):
    m = self._m(invert)
    if keep_shape:
      return m * x
    # Flattened observation (B, C, H*W): zero-padded A x — equivalent to the
    # reference's row-compacted bcmm(pL, x) with the zero rows retained.
    B = x.shape[0]
    C = x.shape[-1]
    masked = m * x
    return masked.reshape(B, -1, C).transpose(0, 2, 1)

  def observation_mask(self, y: Array) -> Array:
    B, C = y.shape[0], y.shape[1]
    flat = self.mask.reshape(1, -1, self.mask.shape[-1]).transpose(0, 2, 1)
    return jnp.broadcast_to(flat, y.shape)

  def project_observed(self, y_flat: Array, image_shape) -> Array:
    """L^T A y: scatter a flattened observation back to image space
    (diag A makes this the masked image itself)."""
    B = y_flat.shape[0]
    C = y_flat.shape[1]
    H, W = image_shape
    img = y_flat.transpose(0, 2, 1).reshape(B, H, W, C)
    return self.mask * img

  def to_matrix(self, shape) -> np.ndarray:
    return np.diag(np.asarray(self.mask).flatten())

  def decompose(self, shape):
    """A = pL @ T with pL the kept-rows projection (reference
    operators.py:186-197); explicit matrices for tests only."""
    A = self.to_matrix(shape)
    keep = np.where(A.sum(axis=1) == 1)[0]
    pL = A[keep].T
    return A, pL, 1


def bcmm(m: Array, v: Array) -> Array:
  """Batched channelled matrix multiplication (reference operators.py:125-130):
  m (B, C, M, N), v (B, C, M) -> (B, C, N)."""
  B, C, M, N = m.shape
  v_ = v.reshape(-1, 1, M)
  m_ = m.reshape(-1, M, N)
  return jnp.einsum('bim,bmn->bin', v_, m_).reshape(B, C, N)


def observe(x, operator: LinearOperator, rng=None, sigma: float = 1.0):
  """Noisy observation y = A x + sigma n (reference operators.py:207-208)."""
  y = operator(x)
  if rng is None:
    noise = np.random.randn(*np.asarray(y).shape)
  else:
    noise = jax.random.normal(rng, y.shape)
  return y + noise * sigma
