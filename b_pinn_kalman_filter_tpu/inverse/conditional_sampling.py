"""Conditional samplers for inverse problems: controlled projection + DPS
(reference: inverse/conditional_sampling.py).

TPU-native: both samplers integrate fully on-device (Dormand-Prince or the
reference's fixed 5000-step Euler) with the score network inside the ODE
right-hand side; DPS takes the data-fidelity gradient *through the score
network* with ``jax.grad`` inside the integrator (the reference needs
`requires_grad_` + host round trips per RHS eval,
conditional_sampling.py:155-165).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from b_pinn_kalman_filter_tpu.core import ode as ode_lib
from b_pinn_kalman_filter_tpu.core import sampling as sampling_lib
from b_pinn_kalman_filter_tpu.core.sde import batch_mul
from b_pinn_kalman_filter_tpu.inverse.obsv_sde import OBSVSDE
from b_pinn_kalman_filter_tpu.inverse.operators import InpaintOperator
from b_pinn_kalman_filter_tpu.models import registry as mutils


def _solve(config, ode_func, x0, t1, eps):
  """Solver dispatch (reference conditional_sampling.py:10-27)."""
  solver = config.inverse.solver
  # Case-normalized: the reference matches 'RK45'/'RK23' exactly, but a
  # lowercase 'rk45' silently reaching the NotImplementedError cost a chip
  # run (advisor round 3) — accept either case, same dispatch.
  if solver.upper() in ('RK45', 'RK23'):
    # RK23 requests fall through to the same on-device Dormand-Prince 5(4);
    # tolerances match the reference call (rtol=atol=1e-3).  The DPS vector
    # field is stiff near t=T (the Tweedie x0_hat divides x_t by the tiny
    # marginal mean), so allow a large step budget.
    result = ode_lib.odeint_dopri(ode_func, x0, t1, eps, rtol=1e-3, atol=1e-3,
                                  max_steps=100_000)
    return result.y
  elif solver.lower() == 'fixed':
    # Reference: 5000 steps of x += f(t, x) * dt with dt = -2e-5 over t in
    # linspace(t1, eps, 5000) (conditional_sampling.py:22-27) — a quirk:
    # dt is NOT the grid spacing, so the total drift integrated is
    # 5000 * 2e-5 = 0.1 time-units regardless of the t-span.  Preserved
    # bit-exactly at the default.  `inverse.fixed_steps` is a TPU-config
    # extension (cheap dry runs / resolution sweeps): dt scales inversely
    # so a non-default step count changes RESOLUTION, not the amount of
    # drift integrated (500 steps of dt=-2e-4 still sums to the
    # reference's 0.1 — without this, fewer steps silently integrated a
    # truncated ODE).
    n_steps = int(config.inverse.get('fixed_steps', 5000))
    ts = jnp.linspace(t1, eps, n_steps)
    dt = -2e-5 * (5000.0 / n_steps)

    def step(x, t):
      return x + ode_func(t, x) * dt, None

    x, _ = jax.lax.scan(step, x0, ts)
    return x
  raise NotImplementedError(
      f"solver {solver!r} unknown (RK45/RK23/fixed here; 'dpm' is handled "
      "inside the samplers themselves)")


def _constrain(x, sharding):
  if sharding is None:
    return x
  return jax.lax.with_sharding_constraint(x, sharding)


def get_sampler(config, obsv_sde: OBSVSDE, shape,
                lambda_schedule: Callable = lambda t: (1.0 - t) * 0.8,
                eps: float = 1e-3, sharding=None):
  """Sampler factory (reference conditional_sampling.py:33-41).
  Returns ``fn(rng, model, params, z=None) -> samples``.  ``sharding``
  batch-shards the posterior sampling over the mesh data axis."""
  if config.inverse.sampler == 'controlled':
    return get_controlled_sampler(config, obsv_sde, shape, lambda_schedule,
                                  eps=eps, sharding=sharding)
  elif config.inverse.sampler == 'dps':
    return get_dps_sampler(config, obsv_sde, shape, eps=eps, sharding=sharding)
  raise NotImplementedError


def get_controlled_sampler(config, obsv_sde: OBSVSDE, shape, lambda_schedule,
                           eps: float = 1e-3, sharding=None):
  """Projection-controlled probability-flow sampler
  (reference conditional_sampling.py:43-97).

  Each RHS eval first mixes the state with a fresh observation sample:
  x <- w L^T A y_t + (1-w) A x + (I-A) x, then evaluates the reverse-ODE
  drift.  With the diagonal inpainting A this is pure mask algebra.

  Reference quirk (preserved): the RETURNED sample is the raw ODE state —
  the projection steers only the drift's evaluation point and is never
  applied to the output (reference conditional_sampling.py:76-96 returns
  the solver state, not optimize_fn(x)), so the observed-region error of
  this sampler is much larger than DPS's (measured in
  tests/test_inverse.py::test_controlled_dpm_matches_rk45_error_profile).

  Solvers: the reference's 'RK45'/'RK23'/'fixed', plus the beyond-parity
  'dpm' fast path (DPM-Solver++(2M) on the same controlled
  probability-flow ODE — the projection is folded into an effective data
  prediction; see the branch below).  Knobs as in the DPS sampler:
  ``inverse.dpm_steps`` / ``dpm_order`` / ``dpm_skip``.
  """
  H, W = shape[1], shape[2]

  def controlled_sampler(rng, model, params, z=None):
    score_fn = mutils.get_score_fn(obsv_sde.state_sde, model, params,
                                   train=False, continuous=True)
    rsde = obsv_sde.state_sde.reverse(score_fn, probability_flow=True)
    rng, prior_rng, z_rng = jax.random.split(rng, 3)
    x = obsv_sde.state_sde.prior_sampling(prior_rng, shape) if z is None else z
    x = _constrain(x, sharding)

    op = obsv_sde.operator
    assert isinstance(op, InpaintOperator), \
        'controlled sampler currently supports inpainting operators'
    mask = op.mask  # (H, W, 1)

    def optimize_fn(rng_t, x, t):
      zr = jax.random.normal(rng_t, x.shape)
      yt = obsv_sde.observe_sampling(zr, t)            # (B, C, N)
      y_img = op.project_observed(yt, (H, W))          # masked image space
      weight = lambda_schedule(t)[:, None, None, None]
      return (weight * y_img + (1.0 - weight) * mask * x
              + (1.0 - mask) * x)

    if config.inverse.solver.lower() == 'dpm':
      # Guided DPM-Solver++(2M) on the controlled probability-flow ODE
      # (beyond-parity; mirrors the DPS 'dpm' path below).  The controlled
      # field F(t, x) = f(x_hat) - 1/2 g^2 score(x_hat), with x_hat the
      # projection-mixed state, rewrites EXACTLY as the standard
      # probability-flow form in x:
      #   F = f(x) - 1/2 g^2 s_eff,
      #   s_eff = score(x_hat) - 2 (f(x_hat) - f(x)) / g^2
      # (VE: f = 0 so s_eff = score(x_hat); VP/subVP: the linear-drift
      # difference term).  The Tweedie inversion
      # x0_eff = (x + std^2 s_eff) / mean hands the shared multistep core
      # the identical ODE field the RK45/'fixed' paths integrate — only
      # the integrator changes (and fresh y_t re-noising happens once per
      # solver node instead of once per adaptive RHS eval, same
      # deterministic per-t key derivation).  Deliberate end-point
      # divergence: denoise=True returns the final Tweedie prediction
      # x0_eff(eps) — one extra guided eval, dpm_steps+1 total — whereas
      # the RK45/'fixed' paths return the raw state at eps (the
      # reference's documented quirk).  At eps=1e-3 the difference is
      # within the trajectory test's tolerance; the exact-semantics
      # RK45 path is the parity reference.
      state_sde = obsv_sde.state_sde

      def x0_eff_fn(xt, t):
        vec_t = jnp.full((shape[0],), t)
        rng_t = jax.random.fold_in(z_rng, (t * 1e6).astype(jnp.int32))
        x_hat = optimize_fn(rng_t, xt, vec_t)
        score = score_fn(x_hat, vec_t)
        f_x, g = state_sde.sde(xt, vec_t)
        f_hat, _ = state_sde.sde(x_hat, vec_t)
        s_eff = score - batch_mul(2.0 / g ** 2, f_hat - f_x)
        mean, std = state_sde.marginal_coef(vec_t)
        return batch_mul(1.0 / mean, xt + batch_mul(std ** 2, s_eff))

      x, _nfe = sampling_lib.dpm_multistep_solve(
          state_sde, x, x0_eff_fn,
          steps=int(config.inverse.get('dpm_steps', 50)),
          order=int(config.inverse.get('dpm_order', 2)),
          skip_type=config.inverse.get('dpm_skip', 'logsnr'),
          eps=eps, denoise=True)
      return x

    def ode_func(t, x):
      vec_t = jnp.full((shape[0],), t)
      # Fold a deterministic per-t noise key (reference draws fresh noise
      # per RHS eval).
      rng_t = jax.random.fold_in(z_rng, (t * 1e6).astype(jnp.int32))
      x_hat = optimize_fn(rng_t, x, vec_t)
      return rsde.sde(x_hat, vec_t)[0]

    return _solve(config, ode_func, x, obsv_sde.state_sde.T, eps)

  return controlled_sampler


def get_dps_sampler(config, obsv_sde: OBSVSDE, shape, eps: float = 1e-3,
                    sharding=None):
  """Diffusion posterior sampling (reference conditional_sampling.py:100-169).

  Solvers: the reference's 'RK45'/'RK23' (on-device Dormand-Prince) and
  'fixed' (5000-step Euler scan), plus the beyond-parity **'dpm'** fast
  path — DPM-Solver++(2M) on the *conditional* probability-flow ODE.  The
  DPS field is stiff near t=T (the Tweedie x0_hat divides by the tiny
  marginal mean), so the adaptive RK45 posterior solve costs thousands of
  RHS evals; the multistep solver in half-log-SNR space integrates the
  identical ODE field in ``inverse.dpm_steps`` (default 50) guided model
  evals.  Knobs (TPU-config extensions, `.get()` defaults so the reference
  configs stay 1:1): ``inverse.dpm_steps``, ``inverse.dpm_order``,
  ``inverse.dpm_skip``.
  """
  obsv_var = config.inverse.variance
  sde = obsv_sde.state_sde

  def dps_sampler(rng, model, params, z=None):
    score_fn = mutils.get_score_fn(sde, model, params,
                                   train=False, continuous=True)
    rng, prior_rng, obs_rng = jax.random.split(rng, 3)
    x = sde.prior_sampling(prior_rng, shape) if z is None else z
    x = _constrain(x, sharding)
    obs_noise = (jax.random.normal(obs_rng, jnp.shape(obsv_sde.y0))
                 * obsv_var ** 0.5)
    # Noise lives only in live observation rows (the reference's compacted
    # vector has no structural zeros; our zero-padded one does).
    obs_noise = obs_noise * obsv_sde.operator.observation_mask(
        jnp.asarray(obsv_sde.y0))
    observation = obsv_sde.y0 + obs_noise

    def x0_hat_fn(xt, t):
      """Tweedie estimate of x0 (reference :116-124).  NOTE the reference
      formula is x/mean + std^2*score (the std^2 term is NOT divided by
      mean) — a documented quirk preserved for the *guidance* term."""
      score = score_fn(xt, t)
      mean, std = sde.marginal_coef(t)
      x0_hat = batch_mul(1.0 / mean, xt) + batch_mul(std ** 2, score)
      return x0_hat, score

    def guidance_fn(x, vec_t):
      """score_cond = grad log p(y | x_t) with the reference's norm scaling
      (reference :126-136); also returns the unconditional score."""

      def logp_fn(xt):
        x0_hat, score = x0_hat_fn(xt, vec_t)
        difference = observation - obsv_sde.operator(x0_hat, keep_shape=False)
        norm = jnp.linalg.norm(difference)
        return -norm ** 2 / obsv_var, (score, norm)

      norm_grad, (score, norm) = jax.grad(logp_fn, has_aux=True)(x)
      score_cond = norm_grad / norm   # scale=True (reference :133-134)
      return score, score_cond

    def drift_fn(score, score_cond, x, t):
      drift, diffusion = sde.sde(x, t)
      return drift - batch_mul(diffusion ** 2, score + score_cond) * 0.5

    if config.inverse.solver.lower() == 'dpm':
      # Guided DPM-Solver++(2M): the conditional reverse ODE
      #   dx/dt = f x - 1/2 g^2 (score + score_cond)
      # is the unconditional probability-flow ODE with total score
      # s_tot = s + s_cond, i.e. with effective data prediction
      #   x0_eff = (x + std^2 s_tot)/mean = x0_true + (std^2/mean) s_cond
      # (x0_true is the exact Tweedie inversion the unconditional DPM
      # sampler uses, core/sampling.py).  Plugging x0_eff into the 2M
      # update integrates *exactly the same ODE field* as the RK45/'fixed'
      # paths above — only the integrator changes.  The guidance itself
      # keeps the reference's x0_hat quirk + norm scaling via guidance_fn.
      # End-point divergence (deliberate, as in the controlled branch):
      # denoise=True returns x0_eff(eps) — dpm_steps+1 guided evals —
      # while RK45/'fixed' return the raw state at eps.
      def x0_eff_fn(xt, t):
        vec_t = jnp.full((shape[0],), t)
        score, score_cond = guidance_fn(xt, vec_t)
        mean, std = sde.marginal_coef(vec_t)
        x0_true = batch_mul(1.0 / mean, xt + batch_mul(std ** 2, score))
        return x0_true + batch_mul(std ** 2 / mean, score_cond)

      x, _nfe = sampling_lib.dpm_multistep_solve(
          sde, x, x0_eff_fn,
          steps=int(config.inverse.get('dpm_steps', 50)),
          order=int(config.inverse.get('dpm_order', 2)),
          skip_type=config.inverse.get('dpm_skip', 'logsnr'),
          eps=eps, denoise=True)
      return x

    def ode_func(t, x):
      vec_t = jnp.full((shape[0],), t)
      score, score_cond = guidance_fn(x, vec_t)
      return drift_fn(score, score_cond, x, vec_t)

    return _solve(config, ode_func, x, sde.T, eps)

  return dps_sampler
