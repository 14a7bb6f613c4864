"""Square-root Unscented Kalman Filter, vmapped over independent filters
(reference: pinn_kalman/ukf.py via the external ``torchfilter`` package —
rebuilt from scratch per SURVEY §7.8).

* Merwe sigma points (alpha=1, beta=0, kappa=0 as the reference configures,
  ukf.py:20-23).
* Predict: true square-root form — the predicted sqrt-covariance comes from
  a QR factorization of the weighted sigma deviations stacked with sqrt(Q),
  PSD by construction.
* Update: true square-root measurement update — one batched QR of
  ``[sqrt(wc_i)(dx_i - K dz_i); (K sqrt R)^T]``, PSD by construction with
  no covariance subtraction (stays PSD in f32 at the reference's 256-dim
  patch states).  Validated against the exact linear Kalman filter and a
  100-step n=256 f32 stress run (tests/test_ukf.py).
* Dynamics couple all N filters (patches form one image through the NS
  stepper), so sigma propagation is vmapped over the sigma-point axis with
  the full (N, n) state per point.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class MerweWeights(NamedTuple):
  wm: np.ndarray      # (2n+1,) mean weights
  wc: np.ndarray      # (2n+1,) covariance weights
  scale: float        # sqrt(n + lambda)


def merwe_weights(n: int, alpha: float = 1.0, beta: float = 0.0,
                  kappa: float = 0.0) -> MerweWeights:
  lam = alpha ** 2 * (n + kappa) - n
  wm = np.full(2 * n + 1, 1.0 / (2 * (n + lam)))
  wc = wm.copy()
  wm[0] = lam / (n + lam)
  wc[0] = lam / (n + lam) + (1 - alpha ** 2 + beta)
  return MerweWeights(wm=wm, wc=wc, scale=float(np.sqrt(n + lam)))


@flax.struct.dataclass
class UKFBelief:
  """Belief over N independent filters of dimension n."""
  mean: Array       # (N, n)
  sqrt_cov: Array   # (N, n, n) lower-triangular


def initialize_beliefs(mean: Array, covariance: Array) -> UKFBelief:
  """(reference UKF.initialize, ukf.py:25-36)."""
  return UKFBelief(mean=mean, sqrt_cov=jnp.linalg.cholesky(covariance))


def sigma_points(belief: UKFBelief, w: MerweWeights) -> Array:
  """Merwe sigma points: (2n+1, N, n)."""
  N, n = belief.mean.shape
  offsets = w.scale * belief.sqrt_cov            # (N, n, n); columns scaled
  plus = belief.mean[None] + offsets.transpose(2, 0, 1)   # (n, N, n)
  minus = belief.mean[None] - offsets.transpose(2, 0, 1)
  return jnp.concatenate([belief.mean[None], plus, minus], axis=0)


def _qr_sqrt(deviations: Array, extra_rows: Array) -> Array:
  """Sqrt covariance from weighted deviation rows + extra rows via QR.

  deviations: (N, s, n) rows; extra_rows: (N, k, n) (e.g. ``sqrt(Q)^T`` in
  predict, ``(K sqrt(R))^T`` in the update).  Returns (N, n, n)
  lower-triangular with nonnegative diagonal.
  """
  stacked = jnp.concatenate([deviations, extra_rows], axis=1)  # (N, s+k, n)
  r = jnp.linalg.qr(stacked, mode='r')           # (N, n, n) upper
  # Canonicalize sign so the diagonal is nonnegative, return lower-tri.
  sign = jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))
  sign = jnp.where(sign == 0, 1.0, sign)
  r = r * sign[..., :, None]
  return r.transpose(0, 2, 1)


def predict(belief: UKFBelief, w: MerweWeights,
            dynamics_fn: Callable[[Array], Tuple[Array, Array]]) -> Tuple[UKFBelief, Array]:
  """UKF predict step.

  ``dynamics_fn(states (N, n)) -> (next_states (N, n), sqrt_Q (N, n, n))``
  is applied per sigma point (vmapped) — all N filters jointly, allowing
  cross-filter coupling (the NS dynamics unpatch/repatch).
  Returns (predicted belief, propagated sigma points (2n+1, N, n)).
  """
  X = sigma_points(belief, w)                    # (S, N, n)

  def prop(x):
    return dynamics_fn(x)[0]

  Xp = jax.vmap(prop)(X)                         # (S, N, n)
  _, sqrt_q = dynamics_fn(belief.mean)

  wm = jnp.asarray(w.wm, Xp.dtype)
  mean = jnp.einsum('s,snd->nd', wm, Xp)

  wc = jnp.asarray(w.wc, Xp.dtype)
  dev = Xp - mean[None]                          # (S, N, n)
  # All wc >= 0 for alpha=1,beta=0,kappa=0 (wc0 = 0); QR over sqrt-weighted rows.
  dev_rows = (jnp.sqrt(jnp.maximum(wc, 0.0))[:, None, None] * dev)
  dev_rows = dev_rows.transpose(1, 0, 2)         # (N, S, n)
  sqrt_cov = _qr_sqrt(dev_rows, sqrt_q.transpose(0, 2, 1))
  return UKFBelief(mean=mean, sqrt_cov=sqrt_cov), Xp


def update(belief: UKFBelief, Xp: Array, w: MerweWeights, observation: Array,
           measurement_fn: Callable[[Array], Tuple[Array, Array]]) -> UKFBelief:
  """True square-root UKF measurement update.

  ``measurement_fn(states (N, n)) -> (pred_obs (N, m), R (N, m, m))``.

  The posterior sqrt-covariance comes from one batched QR of the stacked
  rows ``[sqrt(wc_i) (dx_i - K dz_i); (K sqrt(R))^T]`` — PSD by
  construction, with NO covariance subtraction (the textbook
  ``P = P_pred - K Pzz K^T`` that standard UKFs re-factorize can go
  indefinite in f32 at the reference's 256-dim patch states; see
  tests/test_ukf.py n=256 stress test).  Algebra: since the redrawn sigma
  points reconstruct P_pred exactly,
  ``sum_i wc_i (dx_i - K dz_i)(.)^T + K R K^T
  = P_pred - K Pxz^T - Pxz K^T + K Pzz K^T = P_pred - K Pzz K^T``.
  Negative wc_0 (alpha != 1) is clamped to zero in the sqrt rows, matching
  the predict-step convention; the reference's Merwe parameters
  (alpha=1, beta=0, kappa=0 — reference ukf.py:20-23) give wc_0 = 0 exactly.
  """
  wm = jnp.asarray(w.wm, Xp.dtype)
  wc = jnp.asarray(w.wc, Xp.dtype)

  Z = jax.vmap(lambda x: measurement_fn(x)[0])(Xp)     # (S, N, m)
  _, R = measurement_fn(belief.mean)

  z_mean = jnp.einsum('s,snm->nm', wm, Z)
  dz = Z - z_mean[None]
  dx = Xp - belief.mean[None]

  Pzz = jnp.einsum('s,snm,snk->nmk', wc, dz, dz) + R
  Pxz = jnp.einsum('s,snd,snm->ndm', wc, dx, dz)

  # K = Pxz Pzz^-1 via Cholesky solves.
  chol = jnp.linalg.cholesky(Pzz)
  K = jax.vmap(lambda p, c: jax.scipy.linalg.cho_solve((c, True), p.T).T)(
      Pxz, chol)

  innov = observation - z_mean
  mean = belief.mean + jnp.einsum('ndm,nm->nd', K, innov)

  # Square-root posterior via one batched QR (see docstring).
  resid = dx - jnp.einsum('ndm,snm->snd', K, dz)       # (S, N, n)
  rows = (jnp.sqrt(jnp.maximum(wc, 0.0))[:, None, None] * resid)
  rows = rows.transpose(1, 0, 2)                       # (N, S, n)
  sqrt_R = jnp.linalg.cholesky(R)
  k_sqrtR_T = jnp.einsum('ndm,nmk->nkd', K, sqrt_R)    # (N, m, n)
  return UKFBelief(mean=mean, sqrt_cov=_qr_sqrt(rows, k_sqrtR_T))


def ukf_step(belief: UKFBelief, observation: Array, w: MerweWeights,
             dynamics_fn: Callable, measurement_fn: Callable) -> UKFBelief:
  """One full predict + update cycle (reference torchfilter forward).

  Sigma points are REDRAWN from the predicted belief before the update so
  they carry the process-noise spread (+Q) — required for exactness on
  linear systems (validated vs the closed-form KF)."""
  pred_belief, _ = predict(belief, w, dynamics_fn)
  Xp = sigma_points(pred_belief, w)
  return update(pred_belief, Xp, w, observation, measurement_fn)
