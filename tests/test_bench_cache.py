"""Bench cache fallback semantics (bench.py — VERDICT r2 Next #2).

The driver's BENCH_r{N}.json record must carry every metric even when a
stage is budget-skipped or the TPU tunnel is down, via write-through
BENCH_CACHE.json re-emission labeled ``"cached": true``.  These tests lock
the store/emit round-trip, corruption tolerance (code-review r3: a corrupt
cache must not turn a successful measurement into a failure), and the
headline-last ordering the driver's tail-parse depends on.
"""

import json

import pytest

import bench  # repo root is on sys.path via tests/conftest.py


@pytest.fixture
def tmp_cache(tmp_path, monkeypatch):
  path = tmp_path / 'BENCH_CACHE.json'
  monkeypatch.setattr(bench, '_CACHE_PATH', str(path))
  return path


def test_store_then_emit_round_trip(tmp_cache, capsys):
  rec = {'metric': 'train_imgs_per_sec_cifar10_ddpmpp_batch128_bf16',
         'value': 1629.3, 'unit': 'imgs/sec', 'vs_baseline': 2.41}
  bench._cache_store(rec)
  assert bench._cache_emit('train')
  out = capsys.readouterr().out.strip().splitlines()
  emitted = json.loads(out[-1])
  assert emitted['cached'] is True
  assert emitted['value'] == 1629.3
  assert 'measured_at' in emitted


def test_corrupt_cache_does_not_fail_store(tmp_cache, capsys):
  tmp_cache.write_text('{truncated')
  rec = {'metric': 'pinn_phase2_residual_points_per_sec_pde',
         'value': 591391.0, 'unit': 'residual pts/sec', 'vs_baseline': 0.59}
  bench._cache_store(rec)  # must not raise; rebuilds the cache
  assert bench._cache_emit('pinn')
  assert json.loads(capsys.readouterr().out.strip())['value'] == 591391.0


def test_corrupt_cache_emit_returns_false(tmp_cache):
  tmp_cache.write_text('not json at all')
  assert not bench._cache_emit('train')


def test_missing_cache_emit_returns_false(tmp_cache):
  assert not bench._cache_emit('train')


def test_emit_on_cpu_backend_does_not_cache(tmp_cache, capsys):
  """A CPU dev-drive of a bench stage must print its JSON line but never
  enter BENCH_CACHE.json, or a later cache fallback would re-emit a
  tiny-model CPU number as an on-chip measurement (caught live r3)."""
  bench._emit('train_imgs_per_sec_cifar10_ddpmpp_batch128_bf16',
              12.3, 'imgs/sec', 1.0)  # tests run with JAX_PLATFORMS=cpu
  line = json.loads(capsys.readouterr().out.strip())
  assert line['value'] == 12.3
  assert not tmp_cache.exists()
  assert not bench._cache_emit('train')


def test_stage_registry_consistent():
  """Every secondary stage must have a bench fn, a metric list for cache
  fallback, and an expected wall-time for budget gating."""
  for name in bench._SECONDARY_ORDER:
    assert name in bench._STAGES
    assert bench._SECONDARY_METRICS.get(name), name
    assert name in bench._EXPECTED_SECONDARY_S
  assert 'sampling' in bench._STAGES
  assert bench._SECONDARY_METRICS['sampling'][-1] == (
      'pc_sampling_imgs_per_sec_per_chip_cifar10_ddpmpp_n1000')
  # Parity metrics take budget priority over the beyond-parity dpm row.
  assert bench._SECONDARY_ORDER.index('dpm') > bench._SECONDARY_ORDER.index(
      'pinn')


def test_dpm_cache_slot(tmp_cache, capsys):
  rec = {'metric': 'dpm_solver_sampling_imgs_per_sec_per_chip_nfe20',
         'value': 250.0, 'unit': 'imgs/sec/chip', 'vs_baseline': 113.6}
  bench._cache_store(rec)
  assert bench._cache_emit('dpm')
  assert json.loads(capsys.readouterr().out.strip())['cached'] is True


def test_sampling_cache_order_ends_on_headline(tmp_cache, capsys):
  """The driver tail-parses the LAST JSON line as the headline metric, so
  cached sampling emission must end on pc_sampling_imgs_per_sec..."""
  for metric, value in (
      ('pc_sampling_fraction_of_speed_of_light', 0.751),
      ('pc_sampling_imgs_per_sec_per_chip_cifar10_ddpmpp_n1000', 7.827)):
    bench._cache_store({'metric': metric, 'value': value, 'unit': 'u',
                        'vs_baseline': value})
  assert bench._cache_emit('sampling')
  lines = capsys.readouterr().out.strip().splitlines()
  assert len(lines) == 2
  last = json.loads(lines[-1])
  assert last['metric'] == 'pc_sampling_imgs_per_sec_per_chip_cifar10_ddpmpp_n1000'


def test_stage_timeout_records_lower_bound_and_raises(tmp_cache, capsys,
                                                      monkeypatch):
  """A timed-out live stage must (a) raise _StageTimeout so main() stops
  launching further live stages (the killed in-flight server compile
  drains for ~20 min), and (b) raise the stage's recorded wall to a
  lower bound derived from the timeout — a warm-cache wall from a prior
  run can undershoot a cold-compile day by >2x."""
  import subprocess

  bench._STAGES.setdefault('fake', lambda: None)
  bench._SECONDARY_METRICS.setdefault('fake', ['fake_metric'])
  bench._EXPECTED_SECONDARY_S.setdefault('fake', 1)

  def fake_run(*args, **kwargs):
    raise subprocess.TimeoutExpired(cmd='x', timeout=kwargs.get('timeout'))

  monkeypatch.setattr(subprocess, 'run', fake_run)
  try:
    with pytest.raises(bench._StageTimeout):
      bench._run_secondary('fake', deadline=bench._elapsed() + 3000)
  finally:
    bench._STAGES.pop('fake', None)
    bench._SECONDARY_METRICS.pop('fake', None)
    bench._EXPECTED_SECONDARY_S.pop('fake', None)
  out = capsys.readouterr().out
  assert 'timeout after' in out
  walls = bench._cache_load().get('_stage_walls', {})
  assert walls.get('fake', {}).get('wall_s', 0) > 0


def test_successful_cpu_stage_does_not_record_wall(tmp_cache, monkeypatch):
  """_run_secondary only stores a stage wall when the child actually
  measured on the chip (detected by a refreshed measured_at on the
  stage's primary metric — the child's _emit cache-stores only on
  non-CPU backends), so a CPU dev-drive cannot poison the gating model."""
  import subprocess

  bench._STAGES.setdefault('fake', lambda: None)
  bench._SECONDARY_METRICS.setdefault('fake', ['fake_metric'])
  bench._EXPECTED_SECONDARY_S.setdefault('fake', 1)

  class _Proc:
    returncode = 0
    stdout = '{"metric": "fake_metric", "value": 1.0}\n'
    stderr = ''

  monkeypatch.setattr(subprocess, 'run', lambda *a, **k: _Proc())
  try:
    # No cache write by the (simulated CPU) child: measured_at unchanged.
    out = bench._run_secondary('fake', deadline=bench._elapsed() + 3000)
  finally:
    bench._STAGES.pop('fake', None)
    bench._SECONDARY_METRICS.pop('fake', None)
    bench._EXPECTED_SECONDARY_S.pop('fake', None)
  assert out is not None
  assert 'fake' not in bench._cache_load().get('_stage_walls', {})
