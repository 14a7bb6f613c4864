"""Real-file-format ingestion tests (VERDICT r2 Missing #4).

Every end-to-end run so far used the synthetic stand-ins; these tests write
tiny REAL-format fixtures (classic NetCDF-3 via scipy, CIFAR pickle batches,
MNIST idx) into a temp ``$BPKF_DATA_DIR`` and drive
``get_dataset``/``MaskIterator`` through the actual file-reading branches,
asserting batch values come from the files.  Reference branches:
/root/reference/datasets.py:189-197 (CIFAR via torchvision), :239-267
(NC/PDE netCDF), :279-300 (MNIST masks).
"""

import os
import pickle
import struct

import ml_collections
import numpy as np
import pytest

from b_pinn_kalman_filter_tpu.data import datasets


@pytest.fixture
def data_root(tmp_path, monkeypatch):
  monkeypatch.setenv('BPKF_DATA_DIR', str(tmp_path))
  return tmp_path


def _write_netcdf(path, key, array):
  from scipy.io import netcdf_file
  dims = [f'd{i}' for i in range(array.ndim)]
  with netcdf_file(str(path), 'w') as f:
    for d, n in zip(dims, array.shape):
      f.createDimension(d, n)
    v = f.createVariable(key, 'f', tuple(dims))
    v[:] = array.astype(np.float32)


def _pde_config(size=8):
  c = ml_collections.ConfigDict()
  c.seed = 0
  c.data = ml_collections.ConfigDict()
  c.data.dataset = 'PDE'
  c.data.image_size = size
  c.data.num_channels = 1
  c.data.time_trim = 2
  c.training = ml_collections.ConfigDict({'batch_size': 2})
  c.eval = ml_collections.ConfigDict({'batch_size': 2})
  return c


def test_pde_dataset_reads_real_netcdf(data_root):
  # Known ramp data: frame t, channel c everywhere equal to 100*t + c.
  T, H, W = 16, 8, 8
  data = (100.0 * np.arange(T)[:, None, None, None]
          + np.arange(6)[None, :, None, None])
  data = np.broadcast_to(data, (T, 6, H, W)).astype(np.float32)
  _write_netcdf(data_root / '40000-25-400-200.nc', 'data', data)

  train_loader, _ = datasets.get_dataset(_pde_config(size=H))
  f1, f2, x, y, t, target = next(iter(train_loader))
  # f1/f2 are the density channel (c=2) of consecutive frames.
  frame1 = f1[0, 0, 0, 0]
  assert frame1 % 100 == 2 and 0 <= frame1 // 100 < T, frame1
  assert f2[0, 0, 0, 0] == frame1 + 100  # consecutive frame
  assert x[0, 0, 0, 0] % 100 == 0        # coordx channel (c=0)
  assert y[0, 0, 0, 0] % 100 == 1        # coordy channel (c=1)
  np.testing.assert_array_equal(
      np.asarray(target[0, 0, 0]) % 100, [3, 4, 5])  # u, v, p channels


def test_pde_dataset_reads_npz_escape_hatch(data_root):
  T, H, W = 12, 8, 8
  data = np.arange(T * 6 * H * W, dtype=np.float32).reshape(T, 6, H, W)
  np.savez(str(data_root / '40000-25-400-200.nc.npz'), data=data)
  train_loader, _ = datasets.get_dataset(_pde_config(size=H))
  f1, *_ = next(iter(train_loader))
  assert f1.shape == (2, H, W, 1)
  # Values must come from the ramp, not a synthetic field in [0,1].
  assert f1.max() > 10


def test_nc_dataset_reads_real_netcdf(data_root):
  c = ml_collections.ConfigDict()
  c.seed = 0
  c.data = ml_collections.ConfigDict()
  c.data.dataset = 'NC'
  c.data.image_size = 8
  c.data.num_channels = 1
  c.data.date_range = '2013to2021'
  c.data.category = 'Theta'
  c.data.key = 'THETA'
  c.data.land_cut = 0
  c.training = ml_collections.ConfigDict({'batch_size': 2})
  c.eval = ml_collections.ConfigDict({'batch_size': 2})

  T, D, H, W = 10, 2, 8, 8
  data = np.full((T, D, H, W), 7.25, np.float32)
  _write_netcdf(
      data_root / f'bsose_i122_{c.data.date_range}_{c.data.category}.nc',
      'THETA', data)

  train_loader, _ = datasets.get_dataset(c)
  batch, label = next(iter(train_loader))
  assert batch.shape == (2, H, W, 1)
  np.testing.assert_allclose(batch, 7.25)


def test_cifar10_native_batch_reader(data_root):
  base = data_root / 'cifar-10-batches-py'
  os.makedirs(base)
  rng = np.random.default_rng(0)
  for name, n in [('data_batch_1', 20), ('test_batch', 10)]:
    raw = rng.integers(0, 256, (n, 3072), dtype=np.uint8)
    with open(base / name, 'wb') as f:
      pickle.dump({b'data': raw, b'labels': list(range(n))}, f)

  train, test = datasets._load_cifar10_batches(str(data_root))
  assert len(train) == 20 and len(test) == 10
  img, label = train[3]
  assert img.shape == (32, 32, 3) and img.dtype == np.float32
  assert 0.0 <= img.min() and img.max() <= 1.0 and label == 3

  # get_dataset dispatches CIFAR10 through the native reader.
  c = ml_collections.ConfigDict()
  c.seed = 0
  c.data = ml_collections.ConfigDict(
      {'dataset': 'CIFAR10', 'image_size': 32, 'num_channels': 3})
  c.training = ml_collections.ConfigDict({'batch_size': 4})
  c.eval = ml_collections.ConfigDict({'batch_size': 4})
  train_loader, _ = datasets.get_dataset(c)
  batch = next(iter(train_loader))
  batch = batch[0] if isinstance(batch, tuple) else batch
  assert batch.shape == (4, 32, 32, 3)


def test_mask_iterator_reads_mnist_idx(data_root):
  # Tiny idx3 file: 4 images 28x28, image i filled with value 16*i.
  n, rows, cols = 4, 28, 28
  imgs = (np.arange(n, dtype=np.uint8)[:, None, None] * 16 *
          np.ones((n, rows, cols), np.uint8))
  with open(data_root / 'train-images-idx3-ubyte', 'wb') as f:
    f.write(struct.pack('>IIII', 2051, n, rows, cols))
    f.write(imgs.tobytes())

  loaded = datasets.load_mnist_idx(str(data_root))
  assert loaded is not None and loaded.shape == (n, rows, cols)
  np.testing.assert_array_equal(loaded, imgs)

  c = ml_collections.ConfigDict()
  c.seed = 0
  c.data = ml_collections.ConfigDict({'image_size': 14})
  c.inverse = ml_collections.ConfigDict(
      {'ratio': 0.5, 'invert': True, 'operator': 'inpaint'})
  it = datasets.get_mask_dataset(c)
  assert it._mnist is not None  # the file branch, not random masks
  mask = it.next()
  assert mask.shape == (14, 14, 1)
  assert set(np.unique(mask)) <= {0.0, 1.0}
