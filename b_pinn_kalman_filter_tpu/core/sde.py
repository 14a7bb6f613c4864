"""Forward / reverse SDE definitions (VP, sub-VP, VE) for score-based modeling.

TPU-native redesign of the reference SDE library (reference: sde_lib.py:7-307).
Key differences from the torch original:

* Pure functional: every method maps jnp arrays -> jnp arrays, no device
  state, no buffers.  SDE objects are static Python config carriers, safe to
  close over inside ``jax.jit`` (retrace keyed on object identity).
* Randomness is explicit: ``prior_sampling(rng, shape)`` takes a PRNG key.
* Per-batch scalars stay shape ``(B,)``; use :func:`batch_mul` to broadcast
  against image tensors of any rank (the torch code hardcodes
  ``[:, None, None, None]`` for NCHW rank-4).
* Discrete schedules (betas/sigmas) are precomputed numpy constants that XLA
  folds into the compiled program.
"""

from __future__ import annotations

import abc
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def batch_mul(a: Array, x: Array) -> Array:
  """Multiply per-batch scalars ``a`` of shape (B,) into ``x`` of shape (B, ...)."""
  a = jnp.asarray(a)
  x = jnp.asarray(x)
  return a.reshape(a.shape + (1,) * (x.ndim - a.ndim)) * x


class SDE(abc.ABC):
  """Abstract SDE ``dx = f(x,t) dt + g(t) dW`` over a mini-batch.

  Mirrors the reference surface (sde_lib.py:7-119): ``T``, ``sde``,
  ``coefficient``, ``marginal_coef``, ``marginal_prob``, ``prior_sampling``,
  ``prior_logp``, ``discretize``, ``reverse``.
  """

  def __init__(self, N: int):
    self.N = int(N)

  @property
  @abc.abstractmethod
  def T(self) -> float:
    """End time of the SDE."""

  @abc.abstractmethod
  def sde(self, x: Array, t: Array) -> Tuple[Array, Array]:
    """Drift (B, ...) and diffusion (B,) at state ``x``, time ``t``."""

  @abc.abstractmethod
  def coefficient(self, t: Array) -> Tuple[Array, Array]:
    """Linear-SDE drift/diffusion coefficients at time ``t`` (both (B,))."""

  @abc.abstractmethod
  def marginal_coef(self, t: Array) -> Tuple[Array, Array]:
    """Marginal mean coefficient and std at time ``t`` (both (B,))."""

  def marginal_prob(self, x: Array, t: Array) -> Tuple[Array, Array]:
    """Mean (B, ...) and std (B,) of the perturbation kernel p_t(x_t | x_0)."""
    mean_coef, std = self.marginal_coef(t)
    return batch_mul(mean_coef, x), std

  @abc.abstractmethod
  def prior_sampling(self, rng: Array, shape: Tuple[int, ...]) -> Array:
    """Sample from the prior p_T."""

  @abc.abstractmethod
  def prior_logp(self, z: Array) -> Array:
    """Log-density of the prior at ``z``; returns (B,)."""

  def discretize(self, x: Array, t: Array) -> Tuple[Array, Array]:
    """Euler–Maruyama discretization: x_{i+1} = x_i + f_i(x_i) + G_i z_i."""
    dt = 1.0 / self.N
    drift, diffusion = self.sde(x, t)
    f = drift * dt
    G = diffusion * np.sqrt(dt)
    return f, G

  def reverse(self, score_fn: Callable[[Array, Array], Array],
              probability_flow: bool = False) -> "ReverseSDE":
    """Reverse-time SDE (or probability-flow ODE if ``probability_flow``)."""
    return ReverseSDE(self, score_fn, probability_flow)


class ReverseSDE:
  """Reverse-time SDE built from a forward SDE and a score function.

  Functional equivalent of the reference's dynamically-built RSDE subclass
  (sde_lib.py:81-119).
  """

  def __init__(self, fwd: SDE, score_fn: Callable, probability_flow: bool):
    self.fwd = fwd
    self.score_fn = score_fn
    self.probability_flow = bool(probability_flow)
    self.N = fwd.N

  @property
  def T(self) -> float:
    return self.fwd.T

  def sde(self, x: Array, t: Array) -> Tuple[Array, Array]:
    drift, diffusion = self.fwd.sde(x, t)
    score = self.score_fn(x, t)
    scale = 0.5 if self.probability_flow else 1.0
    drift = drift - batch_mul(diffusion ** 2, score) * scale
    diffusion = jnp.zeros_like(diffusion) if self.probability_flow else diffusion
    return drift, diffusion

  def discretize(self, x: Array, t: Array) -> Tuple[Array, Array]:
    f, G = self.fwd.discretize(x, t)
    scale = 0.5 if self.probability_flow else 1.0
    rev_f = f - batch_mul(G ** 2, self.score_fn(x, t)) * scale
    rev_G = jnp.zeros_like(G) if self.probability_flow else G
    return rev_f, rev_G


class VPSDE(SDE):
  """Variance-preserving SDE (DDPM); reference sde_lib.py:136-199."""

  def __init__(self, beta_min: float = 0.1, beta_max: float = 20, N: int = 1000):
    super().__init__(N)
    self.beta_0 = float(beta_min)
    self.beta_1 = float(beta_max)
    betas = np.linspace(beta_min / N, beta_max / N, N, dtype=np.float64)
    self.discrete_betas = jnp.asarray(betas, jnp.float32)
    alphas = 1.0 - betas
    self.alphas = jnp.asarray(alphas, jnp.float32)
    # Clip for degenerate schedules (beta > 1 when N is tiny) — keeps the
    # sqrt arrays finite; such configs only use the continuous path anyway.
    ac = np.clip(np.cumprod(alphas), 0.0, 1.0)
    self.alphas_cumprod = jnp.asarray(ac, jnp.float32)
    self.sqrt_alphas_cumprod = jnp.asarray(np.sqrt(ac), jnp.float32)
    self.sqrt_1m_alphas_cumprod = jnp.asarray(np.sqrt(1.0 - ac), jnp.float32)

  @property
  def T(self) -> float:
    return 1.0

  def coefficient(self, t):
    beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
    return -0.5 * beta_t, jnp.sqrt(beta_t)

  def sde(self, x, t):
    drift_coef, diffusion = self.coefficient(t)
    return batch_mul(drift_coef, x), diffusion

  def marginal_coef(self, t):
    log_mean_coeff = -0.25 * t ** 2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
    mean = jnp.exp(log_mean_coeff)
    std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))
    return mean, std

  def prior_sampling(self, rng, shape):
    return jax.random.normal(rng, shape)

  def prior_logp(self, z):
    n = np.prod(z.shape[1:])
    flat = z.reshape(z.shape[0], -1)
    return -n / 2.0 * np.log(2 * np.pi) - jnp.sum(flat ** 2, axis=-1) / 2.0

  def discretize(self, x, t):
    """DDPM ancestral discretization (reference sde_lib.py:191-199)."""
    timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
    beta = self.discrete_betas[timestep]
    alpha = self.alphas[timestep]
    f = batch_mul(jnp.sqrt(alpha), x) - x
    G = jnp.sqrt(beta)
    return f, G


class subVPSDE(SDE):
  """Sub-VP SDE that excels at likelihoods; reference sde_lib.py:202-250."""

  def __init__(self, beta_min: float = 0.1, beta_max: float = 20, N: int = 1000):
    super().__init__(N)
    self.beta_0 = float(beta_min)
    self.beta_1 = float(beta_max)
    # Discrete alphas for the Langevin/ALD corrector step-size, matching the
    # upstream score_sde subVPSDE (the fork deleted these, which would crash
    # its own subVP-PC path; we restore upstream semantics).
    alphas = 1.0 - np.linspace(beta_min / N, beta_max / N, N, dtype=np.float64)
    self.alphas = jnp.asarray(alphas, jnp.float32)

  @property
  def T(self) -> float:
    return 1.0

  def coefficient(self, t):
    beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
    discount = 1.0 - jnp.exp(-2 * self.beta_0 * t - (self.beta_1 - self.beta_0) * t ** 2)
    return -0.5 * beta_t, jnp.sqrt(beta_t * discount)

  def sde(self, x, t):
    drift_coef, diffusion = self.coefficient(t)
    return batch_mul(drift_coef, x), diffusion

  def marginal_coef(self, t):
    log_mean_coeff = -0.25 * t ** 2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
    mean = jnp.exp(log_mean_coeff)
    # NOTE: sub-VP std is 1 - exp(2 * log_mean_coeff), not its sqrt.
    std = 1.0 - jnp.exp(2.0 * log_mean_coeff)
    return mean, std

  def prior_sampling(self, rng, shape):
    return jax.random.normal(rng, shape)

  def prior_logp(self, z):
    n = np.prod(z.shape[1:])
    flat = z.reshape(z.shape[0], -1)
    return -n / 2.0 * np.log(2 * np.pi) - jnp.sum(flat ** 2, axis=-1) / 2.0


class VESDE(SDE):
  """Variance-exploding SDE (SMLD); reference sde_lib.py:253-307."""

  def __init__(self, sigma_min: float = 0.01, sigma_max: float = 50, N: int = 1000):
    super().__init__(N)
    self.sigma_min = float(sigma_min)
    self.sigma_max = float(sigma_max)
    self.discrete_sigmas = jnp.asarray(
        np.exp(np.linspace(np.log(sigma_min), np.log(sigma_max), N)), jnp.float32)

  @property
  def T(self) -> float:
    return 1.0

  def coefficient(self, t):
    sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
    drift_coef = jnp.zeros_like(t)
    diffusion = sigma * np.sqrt(2 * (np.log(self.sigma_max) - np.log(self.sigma_min)))
    return drift_coef, diffusion

  def sde(self, x, t):
    drift_coef, diffusion = self.coefficient(t)
    return batch_mul(drift_coef, jnp.ones_like(x)), diffusion

  def marginal_coef(self, t):
    std = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
    return jnp.ones_like(t), std

  def marginal_prob(self, x, t):
    _, std = self.marginal_coef(t)
    return x, std

  def prior_sampling(self, rng, shape):
    return jax.random.normal(rng, shape) * self.sigma_max

  def prior_logp(self, z):
    n = np.prod(z.shape[1:])
    flat = z.reshape(z.shape[0], -1)
    return (-n / 2.0 * np.log(2 * np.pi * self.sigma_max ** 2)
            - jnp.sum(flat ** 2, axis=-1) / (2 * self.sigma_max ** 2))

  def discretize(self, x, t):
    """SMLD (NCSN) discretization (reference sde_lib.py:299-307)."""
    timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
    sigma = self.discrete_sigmas[timestep]
    adjacent_sigma = jnp.where(timestep == 0, jnp.zeros_like(t),
                               self.discrete_sigmas[jnp.maximum(timestep - 1, 0)])
    f = jnp.zeros_like(x)
    G = jnp.sqrt(sigma ** 2 - adjacent_sigma ** 2)
    return f, G


def get_sde(config) -> Tuple[SDE, float]:
  """Build an SDE + integration floor ``eps`` from a config.

  Mirrors reference run_lib.py:45-57 (`_get_sde`).
  """
  name = config.training.sde.lower()
  if name == 'vpsde':
    sde = VPSDE(beta_min=config.model.beta_min, beta_max=config.model.beta_max,
                N=config.model.num_scales)
    eps = 1e-3
  elif name == 'subvpsde':
    sde = subVPSDE(beta_min=config.model.beta_min, beta_max=config.model.beta_max,
                   N=config.model.num_scales)
    eps = 1e-3
  elif name == 'vesde':
    sde = VESDE(sigma_min=config.model.sigma_min, sigma_max=config.model.sigma_max,
                N=config.model.num_scales)
    eps = 1e-5
  else:
    raise NotImplementedError(f"SDE {name} unknown.")
  return sde, eps
