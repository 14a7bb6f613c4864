"""NumpyLoader / PrefetchLoader semantics (data/datasets.py).

The prefetch thread and the worker pool must be *transparent*: batches
bit-identical to the serial path, same order, clean termination on both
exhaustion and early consumer exit.
"""

import numpy as np

from b_pinn_kalman_filter_tpu.data.datasets import NumpyLoader, PrefetchLoader


class _SquareDataset:
  def __init__(self, n):
    self.n = n

  def __len__(self):
    return self.n

  def __getitem__(self, i):
    return np.full((2, 2), i, np.float32), np.float32(i * i)


def _take(loader, k):
  out = []
  for i, b in enumerate(loader):
    if i == k:
      break
    out.append(b)
  return out


def test_workers_bit_identical_to_serial():
  ds = _SquareDataset(37)
  serial = _take(NumpyLoader(ds, 8, shuffle=True, seed=3), 9)
  pooled = _take(NumpyLoader(ds, 8, shuffle=True, seed=3, num_workers=4), 9)
  assert len(serial) == len(pooled) == 9
  for (a1, b1), (a2, b2) in zip(serial, pooled):
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(b1, b2)


def test_prefetch_bit_identical_and_terminates():
  ds = _SquareDataset(20)
  base = NumpyLoader(ds, 4, shuffle=True, seed=7, num_epochs=3)
  serial = list(iter(NumpyLoader(ds, 4, shuffle=True, seed=7, num_epochs=3)))
  prefetched = list(iter(PrefetchLoader(base, depth=2)))
  assert len(prefetched) == len(serial) == 15  # 5 batches x 3 epochs
  for (a1, b1), (a2, b2) in zip(serial, prefetched):
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(b1, b2)


def test_prefetch_early_exit_stops_producer():
  import threading
  before = threading.active_count()
  ds = _SquareDataset(64)
  loader = PrefetchLoader(NumpyLoader(ds, 4, shuffle=False), depth=2)
  it = iter(loader)
  for _ in range(3):
    next(it)
  it.close()  # generator close -> finally -> stop event
  # The daemon producer must wind down (bounded queue + stop flag).
  import time
  deadline = time.time() + 5
  while threading.active_count() > before and time.time() < deadline:
    time.sleep(0.05)
  assert threading.active_count() <= before + 1


def test_prefetch_propagates_producer_exception():
  """A wrapped-loader failure must re-raise in the consumer, not truncate
  the stream into a clean end (ADVICE r2: bare StopIteration far from the
  real cause)."""

  class _FailingLoader:
    def __iter__(self):
      yield np.zeros((2, 2), np.float32)
      raise OSError("disk read failed")

  import pytest
  it = iter(PrefetchLoader(_FailingLoader(), depth=2))
  next(it)  # first batch fine
  with pytest.raises(OSError, match="disk read failed"):
    for _ in it:
      pass


def test_infinite_loader_reshuffles_across_epochs():
  ds = _SquareDataset(8)
  it = iter(NumpyLoader(ds, 8, shuffle=True, seed=0))
  epoch1, _ = next(it)
  epoch2, _ = next(it)
  # same elements, different order with overwhelming probability
  assert sorted(epoch1[:, 0, 0]) == sorted(epoch2[:, 0, 0])
  assert not np.array_equal(epoch1, epoch2)


def test_infinite_loader_smaller_than_batch_wraps_epochs():
  """A PDE-style small eval split (39 items < batch 64) must still serve
  full static-shape batches forever instead of spinning in a yield-nothing
  epoch loop (hit live by --mode train_pinn with pinn_pde_lfn's step-0
  eval; data/datasets.py NumpyLoader divergence note)."""
  ds = _SquareDataset(10)
  it = iter(NumpyLoader(ds, 16, shuffle=True, seed=5))
  batches = [next(it) for _ in range(4)]
  seen = []
  for a, b in batches:
    assert a.shape == (16, 2, 2)
    np.testing.assert_array_equal(a[:, 0, 0] ** 2, b)
    seen.extend(int(v) for v in a[:, 0, 0])
  # 4 batches x 16 = 64 draws over 10 items: epochs concatenated, so every
  # item appears and per-item counts differ by at most one (6 full epochs
  # + a 4-item prefix of the 7th).
  counts = np.bincount(seen, minlength=10)
  assert counts.min() >= 6 and counts.max() <= 7


def test_finite_loader_smaller_than_batch_keeps_drop_last():
  ds = _SquareDataset(10)
  assert list(iter(NumpyLoader(ds, 16, num_epochs=3))) == []


def test_empty_dataset_raises():
  import pytest
  with pytest.raises(ValueError, match="empty dataset"):
    next(iter(NumpyLoader(_SquareDataset(0), 4)))
