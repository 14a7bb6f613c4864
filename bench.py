"""Benchmarks for the driver: one JSON line per metric, headline LAST.

Metrics (BASELINE.json set):
  1. train_imgs_per_sec  — full 57.6M-param DDPM++ train step, batch 128 bf16
  2. pinn_residual_points_per_sec — PINN phase-2 step (data + NS-residual
     losses, nested grads) on the PDE config
  3. pc_sampling imgs/sec/chip (HEADLINE, printed last so the driver's
     tail-parse picks it up): VP DDPM++ CIFAR-10, N=1000 reverse steps,
     euler_maruyama / no corrector — the reference's sampling config
     (reference sampling.py:403-409).
  4. dpm_solver sampling imgs/sec/chip (beyond-parity, budget-permitting):
     same task with the ~20-NFE DPM-Solver++ fast sampler.

Baselines (documented in BASELINE.md): the reference publishes no numbers;
A100 torch estimates are 2.2 imgs/s (sampling, batch 64 N=1000), 675
imgs/s (training, batch 128), and 1.0M residual pts/s (PINN phase 2 —
derivation: the step is 5.31 TFLOP by XLA full-program count, torch eager
nested autograd sustains ~10-15% of A100 TF32's 156 TFLOP/s on PINN
workloads => ~0.26 s / 262k residual points).

Timing discipline (CLAUDE.md): fresh time-derived inputs per run + full
host readback — the TPU tunnel memoizes repeated identical computations
and its block_until_ready does not reliably synchronize.

Budget discipline (VERDICT r2 Next #2): server-side compiles are 10-30 min
per program with no persistent cache, so the three-metric bench can outrun
the driver's timeout.  The run works against BENCH_DEADLINE seconds;
secondaries that do not fit are skipped with an explanatory JSON line, and
the most recent successful on-chip measurement (write-through
BENCH_CACHE.json) is re-emitted labeled ``"cached": true`` with its
timestamp so the driver-visible record always carries every metric.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_SAMPLING_IMGS_PER_SEC = 2.2
A100_TRAIN_IMGS_PER_SEC = 675.0
A100_PINN_RESIDUAL_PTS_PER_SEC = 1.0e6  # see module docstring derivation

# Speed-of-light for the headline program at the reference's exact NFE
# semantics (BASELINE.md round-2 ablation): N=1000 predictor evals x 18.9
# GFLOP/image (XLA cost analysis, 57.6M DDPM++ at 32^2) on this chip's
# ~197 bf16 TFLOP/s peak => batch-64 takes >= 6.14 s at 100% MFU with zero
# overhead = 10.42 imgs/sec/chip.  The >=5x north star (11 imgs/sec) is
# physically unreachable without changing the sampler's semantics; the
# fraction-of-SOL line records how close the sampler is to the hardware
# ceiling.
SPEED_OF_LIGHT_IMGS_PER_SEC = 10.42

# PINN phase-2 speed-of-light (BASELINE.md round-2 analysis, VERDICT r4
# Next #5): the literal-schedule step is 5.31 TFLOP by XLA full-program
# cost analysis, and the nested-grad residual math is f32-bound (bf16
# derivatives diverge), so the ceiling is the v5e's ~49 TFLOP/s f32 axis —
# not the 197 TFLOP/s bf16 peak the other stages ride.  The fraction line
# makes the chip-limited argument driver-visible next to the 0.592
# vs_baseline instead of living only in BASELINE.md prose.
PINN_STEP_TFLOP = 5.31
V5E_F32_PEAK_TFLOPS = 49.0

_BENCH_START = time.monotonic()


def _elapsed():
  return time.monotonic() - _BENCH_START


_CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'BENCH_CACHE.json')
# Metrics each stage produces (for cache fallback lookup).
_SECONDARY_METRICS = {
    'train': ['train_imgs_per_sec_cifar10_ddpmpp_batch128_bf16'],
    'pinn': ['pinn_fraction_of_f32_speed_of_light',
             'pinn_phase2_residual_points_per_sec_pde'],
    'dpm': ['dpm_solver_sampling_imgs_per_sec_per_chip_nfe20'],
    'dps_fast': ['dps_fast_posterior_imgs_per_sec_per_chip_dpm50'],
    'controlled_fast': ['controlled_fast_inverse_imgs_per_sec_per_chip_dpm50'],
    # Headline (imgs/sec/chip) deliberately LAST: the driver tail-parses the
    # final JSON line, so cached emission must end on the headline metric.
    'sampling': ['pc_sampling_fraction_of_speed_of_light',
                 'pc_sampling_imgs_per_sec_per_chip_cifar10_ddpmpp_n1000'],
}


def _cache_store(record):
  """Write-through store of a successful on-chip measurement (keyed by
  metric) so a budget-skipped future run can still surface the number,
  labeled as cached."""
  try:
    cache = {}
    if os.path.exists(_CACHE_PATH):
      try:
        with open(_CACHE_PATH) as f:
          cache = json.load(f)
      except ValueError:
        cache = {}  # corrupt cache: rebuild rather than fail the measurement
    record = dict(record)
    record['measured_at'] = time.strftime('%Y-%m-%dT%H:%M:%S')
    cache[record['metric']] = record
    tmp = _CACHE_PATH + '.tmp'
    with open(tmp, 'w') as f:
      json.dump(cache, f, indent=1, sort_keys=True)
      f.write('\n')
    os.replace(tmp, _CACHE_PATH)
  except OSError:
    pass


def _cache_emit(name: str):
  """Re-emit the last successful on-chip measurement for a stage whose
  live run did not fit the budget — labeled ``"cached": true`` with its
  measurement timestamp, never silently.  Returns the last line emitted
  (the stage's primary metric, since metric lists end with it) or None."""
  try:
    with open(_CACHE_PATH) as f:
      cache = json.load(f)
  except (OSError, ValueError):
    return None
  last = None
  for metric in _SECONDARY_METRICS.get(name, []):
    rec = cache.get(metric)
    if rec:
      rec = dict(rec)
      rec['cached'] = True
      last = json.dumps(rec)
      print(last, flush=True)
  return last


def _emit(metric, value, unit, baseline, **extra):
  record = {
      "metric": metric,
      "value": round(float(value), 3),
      "unit": unit,
      "vs_baseline": round(float(value) / baseline, 3),
  }
  record.update(extra)
  line = json.dumps(record)
  print(line, flush=True)
  # Only real-chip numbers may enter the cache: a CPU dev-drive of a bench
  # stage must never masquerade as an on-chip measurement in a later
  # cache-fallback emission (the axon plugin reports a non-cpu/gpu name).
  if jax.default_backend() not in ('cpu', 'gpu'):
    _cache_store(record)
  return line


def _fresh_key():
  return jax.random.PRNGKey(int(time.time_ns()) % 2 ** 31)


def bench_train():
  from b_pinn_kalman_filter_tpu import configs, models as mutils
  from b_pinn_kalman_filter_tpu.core import losses, sde as sde_lib
  from b_pinn_kalman_filter_tpu.train import state as state_lib

  config = configs.get_config("vp/cifar10_ddpmpp_continuous")
  batch = config.training.batch_size  # 128
  shape = (batch, config.data.image_size, config.data.image_size,
           config.data.num_channels)

  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  tx = losses.get_optimizer(config)
  state = state_lib.create_train_state(variables['params'], tx,
                                       config.model.ema_rate)
  sde, _ = sde_lib.get_sde(config)
  step_fn = jax.jit(
      losses.get_step_fn(sde, model, tx, train=True,
                         reduce_mean=config.training.reduce_mean,
                         continuous=config.training.continuous),
      donate_argnums=(1,))

  def host_batch(i):
    rng = np.random.default_rng(int(time.time_ns()) % 2 ** 31 + i)
    return rng.standard_normal(shape, np.float32) * 0.5

  state, loss = step_fn(_fresh_key(), state, jnp.asarray(host_batch(0)))
  np.asarray(loss)  # compile + warmup

  # Pre-stage fresh batches on device: the tunnel's host->device upload
  # (~25 ms for 1.5 MB) would otherwise inflate the step time; real
  # training overlaps uploads via the PrefetchLoader.
  n_steps = 10
  dev_batches = [jnp.asarray(host_batch(i)) for i in range(n_steps)]
  jax.block_until_ready(dev_batches[-1])
  t0 = time.perf_counter()
  for i in range(n_steps):
    state, loss = step_fn(_fresh_key(), state, dev_batches[i])
  np.asarray(loss)  # chain forces all steps
  dt = (time.perf_counter() - t0) / n_steps
  _emit("train_imgs_per_sec_cifar10_ddpmpp_batch128_bf16",
        batch / dt, "imgs/sec", A100_TRAIN_IMGS_PER_SEC)


def bench_pinn():
  from b_pinn_kalman_filter_tpu import configs
  from b_pinn_kalman_filter_tpu.data import get_mask_dataset
  from b_pinn_kalman_filter_tpu.pinn import losses as pinn_losses
  from b_pinn_kalman_filter_tpu.pinn import pinn_lib
  from b_pinn_kalman_filter_tpu.train import state as state_lib

  config = configs.get_config("pinn/pinn_pde")
  B = config.training.batch_size
  H = config.data.image_size
  C = config.data.num_channels

  model, variables = pinn_lib.init_pinn(config, jax.random.PRNGKey(0))
  tx = pinn_losses.get_pinn_optimizer(config, lr_mul_pres=0.005)
  state = state_lib.create_train_state(variables['params'], tx,
                                       config.model.ema_rate)
  step_fn = jax.jit(pinn_losses.get_pinn_step_fn(config, model, tx, train=True),
                    donate_argnums=(1,))
  mask = jnp.asarray(get_mask_dataset(config).next())

  def host_batch(i):
    rng = np.random.default_rng(int(time.time_ns()) % 2 ** 31 + i)
    f = rng.standard_normal((B, H, H, C)).astype(np.float32)
    f2 = rng.standard_normal((B, H, H, C)).astype(np.float32)
    xy = np.linspace(0, 1, H, dtype=np.float32)
    x = np.broadcast_to(xy[None, None, :, None], (B, H, H, 1)).copy()
    y = np.broadcast_to(xy[None, :, None, None], (B, H, H, 1)).copy()
    t = rng.random((B,)).astype(np.float32)
    target = rng.standard_normal((B, H, H, 6)).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (f, f2, x, y, t, target))

  state, (loss, *_rest) = step_fn(_fresh_key(), state, mask, host_batch(0))
  np.asarray(loss)

  n_steps = 10
  dev_batches = [host_batch(i) for i in range(n_steps)]  # already jnp
  jax.block_until_ready(dev_batches[-1])
  t0 = time.perf_counter()
  for i in range(n_steps):
    state, (loss, *_rest) = step_fn(_fresh_key(), state, mask,
                                    dev_batches[i])
  np.asarray(loss)
  dt = (time.perf_counter() - t0) / n_steps
  _emit("pinn_fraction_of_f32_speed_of_light",
        PINN_STEP_TFLOP / dt / V5E_F32_PEAK_TFLOPS,
        "fraction of v5e f32 peak (5.31 TFLOP/step by XLA cost analysis; "
        "nested-grad residuals are f32-bound)", 1.0)
  _emit("pinn_phase2_residual_points_per_sec_pde",
        B * H * H / dt, "residual pts/sec", A100_PINN_RESIDUAL_PTS_PER_SEC)


def bench_sampling():
  from b_pinn_kalman_filter_tpu import configs, models as mutils
  from b_pinn_kalman_filter_tpu.core import sampling, sde as sde_lib
  from b_pinn_kalman_filter_tpu.data import get_data_inverse_scaler

  config = configs.get_config("vp/cifar10_ddpmpp_continuous")
  batch = 64

  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  params = variables['params']
  sde, eps = sde_lib.get_sde(config)
  inverse_scaler = get_data_inverse_scaler(config)

  shape = (batch, config.data.image_size, config.data.image_size,
           config.data.num_channels)
  sampling_fn = sampling.maybe_jit_sampler(sampling.get_sampling_fn(
      config, sde, model, shape, inverse_scaler, eps))

  samples, _nfe = sampling_fn(_fresh_key(), params)
  np.asarray(samples)  # compile + warmup

  times = []
  for _ in range(5):
    t0 = time.perf_counter()
    samples, _nfe = sampling_fn(_fresh_key(), params)
    np.asarray(samples)
    times.append(time.perf_counter() - t0)
  dt = min(times)

  n_chips = jax.device_count()
  value = batch / dt / n_chips
  # Speed-of-light fraction (VERDICT r2 Next #8): the driver-visible record
  # of the round-2 MFU analysis, not just BASELINE.md prose.
  _emit("pc_sampling_fraction_of_speed_of_light",
        value / SPEED_OF_LIGHT_IMGS_PER_SEC,
        "fraction of 100%-MFU fixed-NFE chip peak (10.42 imgs/sec)", 1.0)
  return _emit("pc_sampling_imgs_per_sec_per_chip_cifar10_ddpmpp_n1000",
               value, "imgs/sec/chip",
               A100_SAMPLING_IMGS_PER_SEC)


def bench_dpm():
  """Beyond-parity fast sampler: DPM-Solver++(2M) at ~20 NFE.

  Same task and model as the headline (full 57.6M DDPM++ CIFAR-10 sample
  generation, batch 64, bf16) but with the multistep solver instead of the
  reference's N=1000 PC loop, so vs_baseline is the same-task speedup over
  the A100 PC estimate.  Batch 64 keeps the row comparable to the PC
  headline across rounds; serving at batch 128 measures ~15% higher
  (BASELINE.md round-5 batch sweep).  NFE semantics differ by design (20 vs 1000);
  sample quality at 20 NFE is validated separately
  (scripts/dpm_quality_check.py, tests/test_dpm_solver.py).
  """
  from b_pinn_kalman_filter_tpu import configs, models as mutils
  from b_pinn_kalman_filter_tpu.core import sampling, sde as sde_lib
  from b_pinn_kalman_filter_tpu.data import get_data_inverse_scaler

  config = configs.get_config("vp/cifar10_ddpmpp_continuous")
  batch = 64

  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  params = variables['params']
  sde, eps = sde_lib.get_sde(config)
  shape = (batch, config.data.image_size, config.data.image_size,
           config.data.num_channels)
  fn = jax.jit(sampling.get_dpm_solver_sampler(
      sde, model, shape, get_data_inverse_scaler(config), steps=20, order=2,
      continuous=config.training.continuous, denoise=True, eps=eps))

  samples, _nfe = fn(_fresh_key(), params)
  np.asarray(samples)  # compile + warmup

  times = []
  for _ in range(5):
    t0 = time.perf_counter()
    samples, _nfe = fn(_fresh_key(), params)
    np.asarray(samples)
    times.append(time.perf_counter() - t0)
  dt = min(times)
  _emit("dpm_solver_sampling_imgs_per_sec_per_chip_nfe20",
        batch / dt / jax.device_count(),
        "imgs/sec/chip (DPM-Solver++ 2M fast sampler, ~20 NFE vs PC's 1000)",
        A100_SAMPLING_IMGS_PER_SEC)


def bench_dps_fast():
  """Beyond-parity fast posterior sampling: DPS guidance x DPM-Solver++(2M).

  Same task as the measured exact-semantics DPS inpainting row (flagship
  57.6M DDPM++ CIFAR-10, batch 16, 50% inpainting, grad-through-score
  guidance) but integrating the *same conditional probability-flow ODE*
  with the 50-step multistep solver (inverse.solver='dpm') instead of
  adaptive RK45 (~15k RHS evals; 213 s/solve on this chip).  Accuracy
  evidence: tests/test_inverse.py::test_dps_dpm_matches_rk45_trajectory —
  against a converged tol=1e-5 reference the 50-step path is ~3x closer
  than the RK45@1e-3 production path itself.

  Baseline: the reference's A100 DPS estimate ~0.03 imgs/sec (host
  round-trip + torch autograd re-entry per RHS eval at thousands of evals
  per solve; our on-device reference-semantics RK45 measures 0.075
  imgs/sec/chip, chip_logs/dps.log).
  """
  import ml_collections
  from b_pinn_kalman_filter_tpu import configs, models as mutils
  from b_pinn_kalman_filter_tpu.inverse.conditional_sampling import get_sampler
  from b_pinn_kalman_filter_tpu.inverse.obsv_sde import get_obsvsde
  from b_pinn_kalman_filter_tpu.inverse.operators import get_operator

  config = configs.get_config("vp/cifar10_ddpmpp_continuous")
  config.inverse = ml_collections.ConfigDict(dict(
      operator='inpaint', invert=False, ratio=0.5, sampler='dps',
      variance=0.01, solver='dpm', dpm_steps=50))
  B = 16
  shape = (B, config.data.image_size, config.data.image_size,
           config.data.num_channels)
  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  operator = get_operator(config)
  _, inv_eps = get_obsvsde(config, jnp.zeros((B, shape[-1],
                                              shape[1] * shape[2])), operator)

  # The observation is a jit ARGUMENT (not a closure constant): one trace +
  # one compile serve every solve.  The first chip measurement of this
  # stage dispatched eagerly and paid a full re-trace of the 57.6M-model
  # scan per solve on the 1-core host — 60 s/solve of pure client CPU for
  # a sub-second device program (chip_logs/dps_fast.log round-4 run 1).
  @jax.jit
  def solve(rng, params, observation):
    obsvsde, _ = get_obsvsde(config, observation, operator)
    fn = get_sampler(config, obsvsde, shape, eps=inv_eps)
    return fn(rng, model, params)

  def fresh_obs(i):
    host = np.random.default_rng(int(time.time_ns()) % 2 ** 31 + i)
    origin = host.random(shape).astype(np.float32) * 2 - 1
    return operator(jnp.asarray(origin), keep_shape=False)

  out = np.asarray(solve(_fresh_key(), variables['params'], fresh_obs(0)))
  assert np.isfinite(out).all()

  times = []
  for i in range(1, 4):
    obs = jax.block_until_ready(fresh_obs(i))
    t0 = time.perf_counter()
    out = np.asarray(solve(_fresh_key(), variables['params'], obs))
    times.append(time.perf_counter() - t0)
  dt = min(times)
  _emit("dps_fast_posterior_imgs_per_sec_per_chip_dpm50",
        B / dt / jax.device_count(),
        "imgs/sec/chip (guided DPM-Solver++ 50-step DPS; exact-semantics "
        "RK45 path: 0.075 on this chip)",
        0.03)


def bench_controlled_fast():
  """The reference's OTHER conditional sampler (controlled projection,
  conditional_sampling.py:43-97) with the fast 'dpm' solver — identical
  program shape to the dps_fast stage (flagship 57.6M DDPM++, batch 16,
  50% inpainting) so the two guided fast paths compare directly; the
  controlled RHS needs no grad-through-score, so this is the framework's
  fastest guided sampler (chip 2026-08-20: 96.85 imgs/sec/chip,
  chip_logs/controlled_fast.log).

  Baseline 0.08 imgs/sec: an A100-torch estimate for the same task via the
  reference's host-round-trip RK45 (our on-device reference-semantics DPS
  RK45 measures 0.075; the controlled ODE is comparably stiff near t=T)."""
  import ml_collections
  from b_pinn_kalman_filter_tpu import configs, models as mutils
  from b_pinn_kalman_filter_tpu.inverse.conditional_sampling import get_sampler
  from b_pinn_kalman_filter_tpu.inverse.obsv_sde import get_obsvsde
  from b_pinn_kalman_filter_tpu.inverse.operators import get_operator

  config = configs.get_config("vp/cifar10_ddpmpp_continuous")
  config.inverse = ml_collections.ConfigDict(dict(
      operator='inpaint', invert=False, ratio=0.5, sampler='controlled',
      variance=0.01, solver='dpm', dpm_steps=50))
  B = 16
  shape = (B, config.data.image_size, config.data.image_size,
           config.data.num_channels)
  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  operator = get_operator(config)
  _, inv_eps = get_obsvsde(config, jnp.zeros((B, shape[-1],
                                              shape[1] * shape[2])), operator)

  @jax.jit
  def solve(rng, params, observation):
    obsvsde, _ = get_obsvsde(config, observation, operator)
    fn = get_sampler(config, obsvsde, shape, eps=inv_eps)
    return fn(rng, model, params)

  def fresh_obs(i):
    host = np.random.default_rng(int(time.time_ns()) % 2 ** 31 + i)
    origin = host.random(shape).astype(np.float32) * 2 - 1
    return operator(jnp.asarray(origin), keep_shape=False)

  out = np.asarray(solve(_fresh_key(), variables['params'], fresh_obs(0)))
  assert np.isfinite(out).all()

  times = []
  for i in range(1, 4):
    obs = jax.block_until_ready(fresh_obs(i))
    t0 = time.perf_counter()
    out = np.asarray(solve(_fresh_key(), variables['params'], obs))
    times.append(time.perf_counter() - t0)
  dt = min(times)
  _emit("controlled_fast_inverse_imgs_per_sec_per_chip_dpm50",
        B / dt / jax.device_count(),
        "imgs/sec/chip (controlled projection sampler x DPM-Solver++ 50 "
        "steps; no grad-through-score)",
        0.08,
        # The 0.08 baseline is extrapolated from the measured DPS RK45
        # number, not itself measured (ADVICE r4): tag it so the ~1200x
        # vs_baseline is not read as measured-vs-measured.
        baseline_estimated=True)


# Fallback expected wall-times (s) for stages that have never completed a
# live run on this install, compile-dominated (CLAUDE.md: server-side
# remote compiles).  Round-3 measurements: headline sampling stage 1067 s,
# train 1133 s, PINN phase-2 (literal schedule) 1653 s, dpm 634 s.  These
# constants rot (VERDICT r4 Weak #5), so they are only the cold-start
# estimate: every successful live stage writes its measured wall into
# BENCH_CACHE.json under ``_stage_walls`` and _expected_wall() prefers
# that, slightly inflated, over these numbers.
_EXPECTED_SECONDARY_S = {'sampling': 1100, 'train': 1150, 'pinn': 1700,
                         'dpm': 700, 'dps_fast': 900, 'controlled_fast': 700}

# Margin (s) a stage must leave for the exit path (tail flush, cache write,
# headline reprint).  VERDICT r4 Weak #1: the r04 kill landed because the
# gate admitted a stage with zero margin — `remaining < expected` let a
# live PINN run finish exactly at the driver's SIGKILL.
_EXIT_MARGIN_S = float(os.environ.get('BENCH_EXIT_MARGIN', '180'))


def _cache_load():
  try:
    with open(_CACHE_PATH) as f:
      return json.load(f)
  except (OSError, ValueError):
    return {}


def _stage_wall_store(name: str, wall_s: float):
  """Record a successful live stage's measured wall-time (write-through,
  same file as the metric cache) so future budget gating is driven by
  measured history instead of hand-maintained constants."""
  try:
    cache = _cache_load()
    walls = cache.setdefault('_stage_walls', {})
    walls[name] = {'wall_s': round(wall_s, 1),
                   'measured_at': time.strftime('%Y-%m-%dT%H:%M:%S')}
    tmp = _CACHE_PATH + '.tmp'
    with open(tmp, 'w') as f:
      json.dump(cache, f, indent=1, sort_keys=True)
      f.write('\n')
    os.replace(tmp, _CACHE_PATH)
  except OSError:
    pass


def _expected_wall(name: str) -> float:
  """Expected live wall for a stage: the last measured wall (+25% headroom
  — server compile times drift) when one exists, else the cold constant."""
  rec = _cache_load().get('_stage_walls', {}).get(name)
  if rec and 'wall_s' in rec:
    return float(rec['wall_s']) * 1.25
  return float(_EXPECTED_SECONDARY_S.get(name, 900))

# Single stage registry: --only dispatch, the secondary run order, and the
# cache-fallback metric map all derive from here (a stage added in one
# place cannot be silently missing from another).
_STAGES = {'sampling': bench_sampling, 'train': bench_train,
           'pinn': bench_pinn, 'dpm': bench_dpm, 'dps_fast': bench_dps_fast,
           'controlled_fast': bench_controlled_fast}
_SECONDARY_ORDER = ('train', 'pinn', 'dpm', 'dps_fast', 'controlled_fast')


def _stale_first_order():
  """Secondaries ordered stalest-cache-first (never-measured first).

  Only ~one secondary fits the post-headline budget per driver run, so
  rotating by cache age keeps every metric's on-chip number as fresh as
  the budget allows across rounds instead of always re-measuring train.
  """
  try:
    with open(_CACHE_PATH) as f:
      cache = json.load(f)   # one snapshot for ALL keys: consistent order
  except (OSError, ValueError):
    cache = {}

  def age_key(name):
    stamps = [cache[m]['measured_at'] for m in _SECONDARY_METRICS[name]
              if m in cache and 'measured_at' in cache[m]]
    if len(stamps) < len(_SECONDARY_METRICS[name]):
      return ''   # some metric never measured: highest priority
    return min(stamps)  # ISO timestamps sort lexicographically
  return sorted(_SECONDARY_ORDER, key=age_key)


def _run_secondary(name: str, deadline: float):
  """Run one secondary bench in a subprocess with a hard timeout.

  Remote-compile stalls on the TPU tunnel block at 0% CPU and are not
  interruptible in-process (SIGALRM never fires inside the RPC), so each
  secondary metric gets its own process.  Only one process touches the TPU
  at a time (sequential).

  Deadline handling (VERDICT r2 Next #2 — BENCH_r02 hit the driver's
  timeout, rc=124, losing the secondaries): the whole bench works against
  ``BENCH_DEADLINE`` seconds; a secondary that cannot plausibly finish in
  the remaining budget is skipped with an explanatory JSON line instead of
  silently eating the driver's timeout, and retries only happen when the
  budget allows a second attempt.
  """
  import subprocess
  import sys
  expected = _expected_wall(name)
  for attempt in range(2):  # tunnel stream errors are transient — retry once
    remaining = deadline - _elapsed()
    # Gate with an explicit exit margin (VERDICT r4 Weak #1): a stage may
    # only start if its full expected wall AND the exit path both fit, so
    # a correctly-estimated stage can never run into the driver's kill.
    if remaining < expected + _EXIT_MARGIN_S:
      print(json.dumps({
          "metric": f"bench_{name}_skipped",
          "error": (f"budget: {remaining:.0f}s left < expected ~{expected:.0f}s"
                    f" + {_EXIT_MARGIN_S:.0f}s exit margin (compile-dominated;"
                    " cached value emitted at start of run)"),
      }), flush=True)
      return None
    # Hard subprocess timeout still leaves the exit margin even when the
    # expectation was wrong (the r04 failure mode: estimate below reality).
    timeout = int(min(float(os.environ.get('BENCH_SECONDARY_TIMEOUT', '2700')),
                      max(remaining - _EXIT_MARGIN_S, 120)))
    # For deciding afterwards whether the child really ran on the chip
    # (CPU walls must not poison the gating model) WITHOUT initializing a
    # jax backend in this parent (a down tunnel blocks init ~15 min): the
    # child's _emit only cache-stores measurements on a real chip, so a
    # refreshed measured_at on the stage's primary metric is the signal.
    primary = _SECONDARY_METRICS[name][-1]
    stamp_before = _cache_load().get(primary, {}).get('measured_at')
    t0 = time.monotonic()
    try:
      proc = subprocess.run([sys.executable, os.path.abspath(__file__),
                             '--only', name],
                            timeout=timeout, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
      print(json.dumps({"metric": f"bench_{name}_error",
                        "error": f"timeout after {timeout}s"}), flush=True)
      # The true wall EXCEEDS the timeout: raise the recorded wall (lower
      # bound) when that increases the estimate, so the next run's gate is
      # realistic — a warm-cache wall from a previous run can undershoot a
      # cold-compile day by >2x.  Then signal the caller to stop launching
      # live stages: the killed in-flight server compile drains for up to
      # ~20 min (CLAUDE.md), so further stages this run would block.
      prior = _cache_load().get('_stage_walls', {}).get(name,
                                                        {}).get('wall_s', 0)
      if timeout * 1.2 > float(prior):
        _stage_wall_store(name, timeout * 1.2)
      raise _StageTimeout(name)
    emitted = None
    for line in proc.stdout.splitlines():
      if line.startswith('{'):
        print(line, flush=True)
        emitted = line
    if proc.returncode == 0 and emitted:
      stamp_after = _cache_load().get(primary, {}).get('measured_at')
      if stamp_after and stamp_after != stamp_before:  # real chip run
        _stage_wall_store(name, time.monotonic() - t0)
      return emitted
    err_lines = [l for l in proc.stderr.splitlines() if 'Error' in l]
    err = (err_lines[-1] if err_lines else proc.stderr[-200:])[:300]
    print(json.dumps({"metric": f"bench_{name}_error",
                      "attempt": attempt + 1, "error": err}), flush=True)
  return None


class _StageTimeout(Exception):
  """A live stage hit its subprocess timeout: the killed in-flight remote
  compile leaves the server draining (up to ~20 min), so the caller should
  stop launching live stages and exit on the cached record."""


def _tunnel_alive(timeout_s: int = 600) -> bool:
  """Bounded TPU liveness probe in a subprocess.

  A down tunnel BLOCKS in-process for ~15+ min before erroring UNAVAILABLE
  (observed round 3, 2026-08-17 outage) and that block is not interruptible
  from inside the process; probing in a killable subprocess keeps a dead
  tunnel from eating the whole bench budget before the first metric.  A
  healthy tunnel answers this tiny matmul in well under a minute.
  """
  import subprocess
  import sys
  code = ("import jax, numpy as np;"
          "x = jax.numpy.ones((128, 128));"
          "print('ALIVE', float(np.asarray(x @ x)[0, 0]))")
  try:
    proc = subprocess.run([sys.executable, '-c', code], timeout=timeout_s,
                          capture_output=True, text=True)
    return proc.returncode == 0 and 'ALIVE' in proc.stdout
  except subprocess.TimeoutExpired:
    return False


def main():
  import sys
  if '--only' in sys.argv:
    which = sys.argv[sys.argv.index('--only') + 1]
    t0 = time.monotonic()
    _STAGES[which]()
    # Manual --only refreshes feed the measured-wall budget model too (the
    # _run_secondary parent overwrites with its slightly larger subprocess
    # wall when this ran under it — both are real walls).
    if jax.default_backend() not in ('cpu', 'gpu'):
      _stage_wall_store(which, time.monotonic() - t0)
    return
  # Whole-bench budget (VERDICT r4 Weak #1 reconstruction: the driver's
  # real kill budget is ~1800 s — BENCH_r02..r04 all rc=124 with larger
  # self-deadlines).  1500 s default leaves ~300 s of driver headroom.
  deadline = float(os.environ.get('BENCH_DEADLINE', '1500'))
  # Emit every cached metric ONCE, immediately, before even probing the
  # tunnel (VERDICT r4 Next #1c): the complete record exists from second
  # one, so a mis-estimated driver kill at ANY later point still leaves
  # all metrics in the tail.  Ends on the headline (cache order puts the
  # sampling stage last, and its metric list ends with the headline).
  headline = None
  for name in _SECONDARY_ORDER + ('sampling',):
    line = _cache_emit(name)
    if name == 'sampling':
      headline = line
  # Bounded probe: a down tunnel blocks init ~15 min in-process (CLAUDE.md
  # round-3 outage); the probe subprocess is killable and the cached
  # record above is already complete if it fails.
  if not _tunnel_alive(timeout_s=int(min(600.0, max(
      deadline - _elapsed() - _EXIT_MARGIN_S, 60)))):
    print(json.dumps({
        "metric": "bench_tunnel_down",
        "error": "TPU tunnel unavailable (liveness probe failed); "
                 "cached on-chip measurements above are the record",
    }), flush=True)
    if headline:
      print(headline, flush=True)
    return
  # Live refresh, headline stage first, then secondaries stalest-first —
  # each gated so it can never run into the driver's kill.  The headline
  # is re-printed after every stage so the driver's last-JSON-line
  # tail-parse lands on it at any interruption point.
  def _drain_note(exc):
    # Killed in-flight server compile => drain: further live stages this
    # run would block against it.  Exit on the (complete) cached record.
    print(json.dumps({
        "metric": "bench_live_stages_stopped",
        "error": (f"stage '{exc.args[0]}' timed out mid-compile; the "
                  "server drains killed compiles for up to ~20 min, so "
                  "remaining stages use their cached values"),
    }), flush=True)

  drained = False
  live = None
  try:
    live = _run_secondary('sampling', deadline)
  except _StageTimeout as exc:
    drained = True
    _drain_note(exc)
  headline = live or headline
  if headline is None:
    headline = json.dumps({"metric": "bench_sampling_error",
                           "error": "no live or cached headline available"})
  print(headline, flush=True)
  if drained:
    return
  for name in _stale_first_order():
    try:
      _run_secondary(name, deadline)
    except _StageTimeout as exc:
      _drain_note(exc)
      print(headline, flush=True)
      return
    print(headline, flush=True)


if __name__ == '__main__':
  main()
