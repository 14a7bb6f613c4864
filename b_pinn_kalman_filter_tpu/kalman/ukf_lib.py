"""UKF driver: patch-state filter + B-PINN fusion loop
(reference: pinn_kalman/ukf.py).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from absl import logging

from b_pinn_kalman_filter_tpu.kalman import ukf as ukf_core
from b_pinn_kalman_filter_tpu.kalman.dynamics import (IdentityKFMeasure,
                                                      NSDynamics)
from b_pinn_kalman_filter_tpu.kalman.patching import patch, unpatch

Array = jax.Array


class UKF:
  """Patch-wise square-root UKF (reference UKF, ukf.py:9-44).

  The full predict+update cycle is ONE jitted XLA program (the per-cycle
  B-PINN uncertainties enter as traced arguments, so re-measuring never
  retraces).  With ``mesh`` given, the N-filter bank is sharded over the
  mesh's data axis: the cycle's dominant cost — the batched (n x S) QR and
  Cholesky factorizations per filter — parallelizes 1:1, while the coupled
  NS dynamics (unpatch -> stencil -> repatch) reshard as XLA sees fit.
  """

  def __init__(self, config, mesh=None):
    self.dim = config.kf.patch_size
    self.size = config.data.image_size
    self.mesh = mesh
    self.dynamics = NSDynamics(config)
    self.measurement = IdentityKFMeasure(config)
    self.weights = ukf_core.merwe_weights(self.dim ** 2, alpha=1.0,
                                          beta=0.0, kappa=0.0)
    self.belief: Optional[ukf_core.UKFBelief] = None
    self._cycle = jax.jit(self._cycle_impl)

  def _cycle_impl(self, belief, obs_state, uncer_flow, uncer_pres):
    meas = lambda s: self.measurement.apply(s, uncer_flow, uncer_pres)
    return ukf_core.ukf_step(belief, obs_state, self.weights,
                             self.dynamics, meas)

  def _shard(self, tree):
    """Shard every (N, ...) leaf over the mesh data axis (replicate leaves
    whose leading dim doesn't divide)."""
    if self.mesh is None:
      return tree
    from b_pinn_kalman_filter_tpu.parallel import mesh as mesh_lib
    n_data = mesh_lib.get_data_axis_size(self.mesh)

    def put(a):
      sh = (mesh_lib.data_sharding(self.mesh)
            if a.ndim >= 1 and a.shape[0] % n_data == 0
            else mesh_lib.replicate_sharding(self.mesh))
      return jax.device_put(a, sh)

    return jax.tree_util.tree_map(put, tree)

  def initialize(self, x0: Optional[Array] = None, var: float = 0.01):
    """(reference ukf.py:25-36)."""
    n = self.dim ** 2
    N = (self.size // self.dim) ** 2 * 4
    if x0 is None:
      mean = jnp.full((N, n), 0.1)
      cov = jnp.eye(n)[None].repeat(N, axis=0) * 0.01
    else:
      mean = x0
      cov = jnp.eye(n)[None].repeat(x0.shape[0], axis=0) * var
    self.belief = self._shard(ukf_core.initialize_beliefs(mean, cov))

  def __call__(self, obsv: Array) -> Array:
    """One filter cycle on a (B, H, W, 4) observation image
    (reference ukf.py:38-44)."""
    obs_state = self._shard(patch(obsv, self.dim))
    uncers = self._shard((self.measurement.uncer_flow,
                          self.measurement.uncer_pres))
    self.belief = self._cycle(self.belief, obs_state, *uncers)
    return unpatch(self.belief.mean, self.dim, self.size, 4)


class PINN_KF:
  """B-PINN measurement + UKF fusion loop (reference PINN_KF, ukf.py:46-82)."""

  def __init__(self, config, model=None, bparams=None, mesh=None):
    from b_pinn_kalman_filter_tpu.pinn.pinn_lib import init_pinn

    self.config = config
    self.ukf = UKF(config, mesh=mesh)
    self._measure = jax.jit(self._measure_impl, static_argnames=('n',))
    if model is None:
      model, variables = init_pinn(config, jax.random.PRNGKey(config.seed))
      from b_pinn_kalman_filter_tpu.pinn import bayes
      bparams = bayes.make_bpinn_params(variables['params'], config,
                                        pretrained=False)
    self.model = model
    self.bparams = bparams
    self.f_prev: Optional[Array] = None

  def initialize(self, f: Array, v: Array, p: Array, var: float = 1e-2):
    """(reference ukf.py:54-64): state = patched [f, v, p]."""
    initial_state = jnp.concatenate([f, v, p], axis=-1)
    initial_state = patch(initial_state, self.config.kf.patch_size)
    self.ukf.initialize(initial_state, var)
    self.f_prev = f

  def _measure_impl(self, rng, bparams, f1, f2, x, y, t, n=8):
    """B-PINN MC measurement as ONE jitted program: n posterior draws
    (vmapped) reduced to mean/std in-device — eagerly this is hundreds of
    per-primitive dispatches per fusion cycle on the TPU tunnel.

    The draw axis is deliberately NOT sharding-constrained: vmap folds it
    into the convolutions' ``feature_group_count``, and a draw-axis
    constraint propagates back into those grouped convs, which GSPMD then
    partitions inconsistently (kernel output split n ways while the group
    count stays n — invalid conv at lowering, observed on the 8-device
    mesh).  The measurement is small (n=8 draws of one image); the
    multi-chip axis of this pipeline is the UKF filter bank."""
    from b_pinn_kalman_filter_tpu.pinn import bayes

    flows, press = bayes.sample_uvp(
        rng, self.model, bparams, f1, f2, x, y, t, n=n,
        size=(self.ukf.size, self.ukf.size))
    return (flows.mean(axis=0), flows.std(axis=0),
            press.mean(axis=0), press.std(axis=0))

  def __call__(self, rng: Array, x: Array, y: Array, t: Array,
               f: Array) -> Array:
    """(reference ukf.py:66-82)."""
    if self.f_prev is None:
      self.f_prev = jnp.ones_like(f) * 0.1

    flow, flow_uncer, pres, pres_uncer = self._measure(
        rng, self.bparams, self.f_prev, f, x, y, t)

    self.f_prev = f
    self.ukf.measurement.update_uncertainty(flow_uncer, pres_uncer)

    obsv = jnp.concatenate([f, flow, pres], axis=-1)
    return self.ukf(obsv)


def run(config, ckptdir: Optional[str], workdir: str, n_steps: int = 10):
  """CLI 'ukf' mode: B-PINN + UKF rollout on (synthetic) NS data
  (reference ukf.py __main__ :85-138)."""
  from b_pinn_kalman_filter_tpu.data.datasets import _cached_ns_rollout
  from b_pinn_kalman_filter_tpu.pinn import bayes
  from b_pinn_kalman_filter_tpu.pinn.pinn_lib import init_pinn
  from b_pinn_kalman_filter_tpu.train import checkpoint as ckpt_lib
  from b_pinn_kalman_filter_tpu.utils.misc import save_image_grid

  os.makedirs(workdir, exist_ok=True)
  size = config.data.image_size
  rng = jax.random.PRNGKey(config.seed)

  # Ground-truth rollout frames (T, 6, H, W): coordx, coordy, f, u, v, p.
  data = _cached_ns_rollout(max(n_steps + 2, 64), size, size, config.seed)

  model, variables = init_pinn(config, jax.random.PRNGKey(0))
  bparams = bayes.make_bpinn_params(variables['params'], config,
                                    pretrained=False)
  if ckptdir and os.path.exists(ckptdir):
    from b_pinn_kalman_filter_tpu.pinn import losses as pinn_losses
    from b_pinn_kalman_filter_tpu.train import state as state_lib
    tx = pinn_losses.get_pinn_optimizer(config, is_bpinn=True)
    template = state_lib.create_train_state(bparams, tx, config.model.ema_rate)
    restored = ckpt_lib.restore_checkpoint(ckptdir, template)
    bparams = restored.ema_params

  from b_pinn_kalman_filter_tpu.parallel import mesh as mesh_lib
  pikal = PINN_KF(config, model, bparams, mesh=mesh_lib.create_mesh(config))

  def prep(channel, idx):
    return jnp.asarray(data[idx, channel])[None, :, :, None]

  f0 = prep(2, 0)
  v0 = jnp.concatenate([prep(3, 0), prep(4, 0)], axis=-1)
  p0 = prep(5, 0)
  pikal.initialize(f0, v0, p0)

  preds, gts, obsvs = [], [], []
  t = jnp.asarray([1.0])
  for i in range(1, n_steps + 1):
    x = prep(0, i)
    y = prep(1, i)
    f_gt = prep(2, i)
    gts.append(np.asarray(f_gt))

    rng, obs_rng, mc_rng = jax.random.split(rng, 3)
    f_obs = pikal.ukf.measurement.observe(obs_rng, f_gt)
    pred = pikal(mc_rng, x, y, t, f_obs)
    preds.append(np.asarray(pred[..., 0:1]))
    obsvs.append(np.asarray(f_obs))
    mse = float(np.mean((preds[-1] - gts[-1]) ** 2))
    logging.info("ukf step %d: f MSE %.5e", i, mse)
    t = t + 1

  grid = np.concatenate([np.concatenate(gts, 0), np.concatenate(preds, 0),
                         np.concatenate(obsvs, 0)], axis=0)
  save_image_grid(np.clip(grid, 0, 1), os.path.join(workdir, 'ukf.png'),
                  nrow=len(gts))
  final_mse = float(np.mean((np.concatenate(preds) - np.concatenate(gts)) ** 2))
  with open(os.path.join(workdir, 'ukf_mse.txt'), 'w') as fh:
    fh.write(f"{final_mse}\n")
  return final_mse
