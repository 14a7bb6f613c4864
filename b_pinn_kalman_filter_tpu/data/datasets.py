"""Datasets and loaders producing NHWC numpy batches (reference: datasets.py).

TPU-native redesign: a lightweight numpy pipeline (no torch DataLoader
workers) that yields host numpy arrays; ``parallel.shard_batch`` then
device-puts them sharded over the mesh's data axis.  Batches are NHWC —
the native TPU conv layout (the reference is NCHW).

Dataset sources mirror the reference:

* CIFAR10 / SVHN / CELEBA via torchvision *if local files exist* —
  this environment has no egress, so ``download=False``.
* NC (Southern-Ocean netCDF, reference datasets.py:239-253) and PDE
  (Navier–Stokes sim frames, reference datasets.py:255-267) read their
  netCDF files when present at the reference's paths or
  ``$BPKF_DATA_DIR``; otherwise a deterministic synthetic generator
  with the same shapes/semantics stands in (the reference hardcodes
  ``/data1/DATA_PUBLIC/...`` absolute paths that do not ship).
  The synthetic PDE data is a real incompressible NS rollout computed
  with ``ops.ns_step`` — same physics as the reference's CUDA simulator.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Iterator, Optional, Tuple

import numpy as np

DATA_DIR = os.environ.get('BPKF_DATA_DIR', './data')


def data_dir() -> str:
  """Local data root; re-reads ``$BPKF_DATA_DIR`` so tests (and late env
  changes) can point file-reading branches at fixtures."""
  return os.environ.get('BPKF_DATA_DIR', DATA_DIR)


def get_data_scaler(config) -> Callable:
  """Data normalizer; data assumed in [0, 1] (reference datasets.py:121-127)."""
  if config.data.centered:
    return lambda x: x * 2. - 1.
  return lambda x: x


def get_data_inverse_scaler(config) -> Callable:
  """Inverse data normalizer (reference datasets.py:130-136)."""
  if config.data.centered:
    return lambda x: (x + 1.) / 2.
  return lambda x: x


def load_images_from_folder(folder: str):
  """Load all images in a folder as [0,1] float arrays
  (reference datasets.py:27-34)."""
  import imageio.v2 as imageio
  images = []
  for filename in sorted(os.listdir(folder)):
    if filename.endswith(('.png', '.jpg', '.jpeg', '.gif', '.bmp')):
      images.append(imageio.imread(os.path.join(folder, filename)) / 255.0)
  return images


def trim_images(images, ax, ay, bx, by):
  """Crop a list of images (reference datasets.py:37-38)."""
  return np.array([img[ax:bx, ay:by] for img in images])


class Binarize:
  """Threshold transform (reference datasets.py:41-51)."""

  def __init__(self, threshold=0.5, invert=False):
    self.threshold = threshold
    self.invert = invert

  def __call__(self, img):
    img = np.asarray(img) > self.threshold
    if self.invert:
      img = ~img
    return img.astype(np.float32)


class Repeat:
  """Batch-repeat transform (reference datasets.py:54-60)."""

  def __init__(self, times):
    self.times = times

  def __call__(self, img):
    img = np.asarray(img)
    return np.broadcast_to(img, (self.times,) + img.shape).copy()


class NumpyLoader:
  """Infinite shuffled batch iterator over an indexable dataset.

  Replaces torch ``DataLoader(shuffle=True, drop_last=True, num_workers=4)``
  (reference datasets.py:273-275).  ``__iter__`` yields batches forever
  (epoch reshuffles) unless ``num_epochs`` is set.  ``num_workers`` > 1
  fetches the items of each batch through a thread pool (the analog of the
  reference's 4 DataLoader workers); order within the batch is preserved,
  so batches are bit-identical to the serial path.

  Divergence from the reference for datasets smaller than the batch: torch
  ``drop_last=True`` yields *zero* batches there (the reference train loops
  would crash on ``next()``; e.g. the PDE test split is ``int(T*0.1)-1 = 39``
  items vs batch 64, reference datasets.py:88-99,273-275).  An *infinite*
  loader here instead concatenates consecutive (re-shuffled) epochs so every
  batch is full ``batch_size`` — shapes stay static for XLA and ``next()``
  always returns (the yield-nothing epoch loop was an infinite 100%-CPU
  spin).  Finite-``num_epochs`` loaders keep exact drop_last semantics.
  """

  def __init__(self, dataset, batch_size: int, shuffle: bool = True,
               seed: int = 0, num_epochs: Optional[int] = None,
               num_workers: int = 1):
    self.dataset = dataset
    self.batch_size = batch_size
    self.shuffle = shuffle
    self.seed = seed
    self.num_epochs = num_epochs
    self.num_workers = num_workers

  def _epoch_order(self, rng, n):
    return rng.permutation(n) if self.shuffle else np.arange(n)

  def __iter__(self) -> Iterator:
    rng = np.random.default_rng(self.seed)
    n = len(self.dataset)
    if n == 0:
      raise ValueError('NumpyLoader: empty dataset (would never yield)')
    pool = None
    if self.num_workers > 1:
      import concurrent.futures
      pool = concurrent.futures.ThreadPoolExecutor(self.num_workers)

    def fetch(idx):
      if pool is not None:
        return list(pool.map(self.dataset.__getitem__, idx))
      return [self.dataset[i] for i in idx]

    try:
      if self.num_epochs is None and n < self.batch_size:
        # Small dataset, infinite consumer: wrap epochs so batches stay full
        # batch_size (static shapes; see class docstring divergence note).
        buf: list = []
        while True:
          while len(buf) < self.batch_size:
            buf.extend(int(i) for i in self._epoch_order(rng, n))
          idx, buf = buf[:self.batch_size], buf[self.batch_size:]
          yield _stack_items(fetch(idx))
      epoch = 0
      while self.num_epochs is None or epoch < self.num_epochs:
        order = self._epoch_order(rng, n)
        for start in range(0, n - self.batch_size + 1, self.batch_size):
          idx = [int(i) for i in order[start:start + self.batch_size]]
          yield _stack_items(fetch(idx))
        epoch += 1
    finally:
      if pool is not None:
        pool.shutdown(wait=False)


_PREFETCH_END = object()


class _PrefetchError:
  """Sentinel carrying a producer-thread exception to the consumer."""

  def __init__(self, exc: BaseException):
    self.exc = exc


class PrefetchLoader:
  """Double-buffering wrapper: a daemon thread produces batches into a
  bounded queue so host batch assembly overlaps device compute (the
  reference gets this from torch DataLoader workers, datasets.py:273-275).

  ``depth`` bounds host memory to ``depth`` in-flight batches.
  """

  def __init__(self, loader, depth: int = 2):
    self.loader = loader
    self.depth = depth

  def __iter__(self) -> Iterator:
    import queue
    import threading

    q = queue.Queue(maxsize=self.depth)
    stop = threading.Event()

    def _put(item):
      while not stop.is_set():
        try:
          q.put(item, timeout=0.5)
          return True
        except queue.Full:
          continue
      return False

    def _produce():
      # Wrapped-loader exceptions must reach the consumer: swallowing them
      # into a clean end-of-stream makes the infinite train loop die with a
      # bare StopIteration far from the real cause (ADVICE r2).
      sentinel = _PREFETCH_END
      try:
        for item in iter(self.loader):
          if not _put(item):
            return
      except BaseException as exc:  # re-raised in the consumer
        sentinel = _PrefetchError(exc)
      _put(sentinel)

    thread = threading.Thread(target=_produce, daemon=True)
    thread.start()
    try:
      while True:
        item = q.get()
        if item is _PREFETCH_END:
          return
        if isinstance(item, _PrefetchError):
          raise item.exc
        yield item
    finally:
      stop.set()


def _stack_items(items):
  first = items[0]
  if isinstance(first, tuple):
    return tuple(np.stack([np.asarray(it[k]) for it in items])
                 for k in range(len(first)))
  return np.stack([np.asarray(it) for it in items])


def _random_crop(rng: np.random.Generator, img: np.ndarray, size: int) -> np.ndarray:
  """Random spatial crop (pad if needed) of an (..., H, W) array."""
  h, w = img.shape[-2], img.shape[-1]
  if h < size or w < size:
    pad_h, pad_w = max(0, size - h), max(0, size - w)
    pads = [(0, 0)] * (img.ndim - 2) + [(0, pad_h), (0, pad_w)]
    img = np.pad(img, pads)
    h, w = img.shape[-2], img.shape[-1]
  i = int(rng.integers(0, h - size + 1))
  j = int(rng.integers(0, w - size + 1))
  return img[..., i:i + size, j:j + size]


# ---------------------------------------------------------------------------
# Synthetic stand-ins (deterministic, shape-faithful).
# ---------------------------------------------------------------------------

def _smooth_field(rng: np.random.Generator, shape: Tuple[int, ...],
                  smoothness: int = 8) -> np.ndarray:
  """Smooth random field in [0, 1] via low-res noise + bilinear upsampling."""
  h, w = shape[-2], shape[-1]
  lo = rng.standard_normal(shape[:-2] + (max(2, h // smoothness),
                                         max(2, w // smoothness)))
  ys = np.linspace(0, lo.shape[-2] - 1, h)
  xs = np.linspace(0, lo.shape[-1] - 1, w)
  y0 = np.floor(ys).astype(int); y1 = np.minimum(y0 + 1, lo.shape[-2] - 1)
  x0 = np.floor(xs).astype(int); x1 = np.minimum(x0 + 1, lo.shape[-1] - 1)
  wy = (ys - y0)[:, None]; wx = (xs - x0)[None, :]
  a = lo[..., y0, :][..., :, x0]
  b = lo[..., y0, :][..., :, x1]
  c = lo[..., y1, :][..., :, x0]
  d = lo[..., y1, :][..., :, x1]
  out = a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx
  out = out - out.min(axis=(-2, -1), keepdims=True)
  denom = out.max(axis=(-2, -1), keepdims=True)
  return out / np.maximum(denom, 1e-8)


class SyntheticImages:
  """Deterministic synthetic image dataset (CIFAR-like stand-in)."""

  def __init__(self, n: int, size: int, channels: int, seed: int = 0):
    self.n, self.size, self.channels, self.seed = n, size, channels, seed

  def __len__(self):
    return self.n

  def __getitem__(self, idx):
    rng = np.random.default_rng(self.seed * 1_000_003 + idx)
    img = _smooth_field(rng, (self.channels, self.size, self.size), 4)
    return img.transpose(1, 2, 0).astype(np.float32), 0  # HWC


def _generate_ns_rollout(n_frames: int, h: int, w: int, seed: int = 0) -> np.ndarray:
  """Incompressible-NS rollout (T, 6, H, W): [coordx, coordy, density, u, v, p].

  Uses the framework's own NS stepper (ops.ns_step jnp reference impl) on
  CPU — the same physics the reference's CUDA simulator produces
  (reference op/ns_step_kernel.cu, pinn_kalman/simulator.py:38-63).
  """
  try:
    from b_pinn_kalman_filter_tpu.ops import ns_step as ns
    have_ns = True
  except ImportError:
    have_ns = False

  rng = np.random.default_rng(seed)
  coordx, coordy = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h))
  coordx = coordx.astype(np.float32)
  coordy = coordy.astype(np.float32)
  frames = np.zeros((n_frames, 6, h, w), np.float32)
  density = _smooth_field(rng, (h, w), 6).astype(np.float32)
  u = (_smooth_field(rng, (h, w), 8) - 0.5).astype(np.float32) * 2.0
  v = (_smooth_field(rng, (h, w), 8) - 0.5).astype(np.float32) * 2.0
  p = np.zeros((h, w), np.float32)

  dt, dx = 0.0025, 1.0 / max(h, w)

  # Fast path: native C++ simulator (csrc/ns_sim.cpp) on the host CPU.
  try:
    from b_pinn_kalman_filter_tpu.data.native import ns_sim_rollout
    native = ns_sim_rollout(n_frames, density.copy(), u.copy(), v.copy(),
                            p.copy(), coordx, coordy, dt, dx)
    if native is not None:
      return native
  except Exception:
    pass
  if have_ns:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _step(d_, u_, v_, p_):
      u_, v_ = ns.update_velocity(u_, v_, p_, dt, dx)
      p_ = ns.update_pressure(u_, v_, p_, dt, dx)
      d_ = ns.update_density(d_, u_, v_, dt, dx)
      # Mild damping keeps the explicit scheme stable over long synthetic
      # rollouts (the raw stepper diverges after ~160 free-running frames;
      # the reference only ever runs it for ~100, simulator.py:87).
      return d_, u_ * 0.99, v_ * 0.99, p_ * 0.95

  for i in range(n_frames):
    frames[i, 0], frames[i, 1] = coordx, coordy
    frames[i, 2], frames[i, 3], frames[i, 4], frames[i, 5] = density, u, v, p
    if have_ns:
      d_, u_, v_, p_ = _step(*[jnp.asarray(a)[None] for a in
                               (density, u, v, p)])
      density, u, v, p = (np.asarray(a[0]) for a in (d_, u_, v_, p_))
    else:
      # Crude fallback advection (only used before ops.ns_step lands).
      density = np.roll(density, 1, axis=1)
  return frames


def _cached_ns_rollout(n_frames: int, h: int, w: int, seed: int) -> np.ndarray:
  # data_dir() participates in the memo key: tests repoint BPKF_DATA_DIR and
  # expect fixtures under the new dir to be honored, not a stale in-process hit.
  return _cached_ns_rollout_at(data_dir(), n_frames, h, w, seed)


@functools.lru_cache(maxsize=2)
def _cached_ns_rollout_at(base_dir: str, n_frames: int, h: int, w: int,
                          seed: int) -> np.ndarray:
  cache = os.path.join(base_dir, f'ns_rollout_{n_frames}x{h}x{w}_{seed}.npy')
  if os.path.exists(cache):
    return np.load(cache)
  frames = _generate_ns_rollout(n_frames, h, w, seed)
  try:
    os.makedirs(base_dir, exist_ok=True)
    np.save(cache, frames)
  except OSError:
    pass
  return frames


# ---------------------------------------------------------------------------
# PDE / NC datasets (reference datasets.py:63-115)
# ---------------------------------------------------------------------------

class PDEDataset:
  """Consecutive NS sim frames (reference PDEDataset, datasets.py:88-115).

  Returns ``(f1, f2, x, y, t, target)`` where f1/f2 are consecutive density
  frames, x/y coordinate channels, t the frame index, target = (u, v, p).
  All images HWC float32.
  """

  def __init__(self, data: np.ndarray, image_size: int, split: str = 'train',
               trim: int = 160, seed: int = 0):
    self.data = data          # (T, 6, H, W)
    self.len = len(data)
    self.split = split
    self.offset = trim
    self.image_size = image_size
    self.seed = seed

  def __len__(self):
    n = (int(self.len * 0.9) - self.offset if self.split == 'train'
         else int(self.len * 0.1))
    return max(n - 1, 0)

  def __getitem__(self, idx):
    base = (idx + self.offset if self.split == 'train'
            else int(self.len * 0.9) + idx)
    t = idx + 1
    rng = np.random.default_rng(self.seed * 1_000_003 + idx)
    sample = self.data[base:base + 2]          # (2, 6, H', W')
    sample = _random_crop(rng, sample, self.image_size)
    x_p, x_t = sample[0], sample[1]

    def hwc(a):
      return np.ascontiguousarray(a.transpose(1, 2, 0)).astype(np.float32)

    return (hwc(x_p[2:3]), hwc(x_t[2:3]), hwc(x_t[0:1]), hwc(x_t[1:2]),
            np.float32(t), hwc(x_t[3:]))


class NCDataset:
  """Ocean-temperature frames (reference CustomDataset, datasets.py:63-85)."""

  def __init__(self, data: np.ndarray, image_size: int, split: str = 'train',
               land_cut: int = 0, seed: int = 0):
    self.data = data           # (T, D, H, W)
    self.len = len(data)
    self.split = split
    self.land_cut = land_cut
    self.image_size = image_size
    self.seed = seed

  def __len__(self):
    return int(self.len * 0.8) if self.split == 'train' else int(self.len * 0.2)

  def __getitem__(self, idx):
    base = idx if self.split == 'train' else int(self.len * 0.8) + idx
    rng = np.random.default_rng(self.seed * 1_000_003 + idx)
    sample = self.data[base, 0, self.land_cut:]
    sample = _random_crop(rng, sample[None], self.image_size)[0]
    return sample[..., None].astype(np.float32), 0  # HWC


def _load_netcdf(path: str, key: str) -> Optional[np.ndarray]:
  """Read variable ``key`` from a netCDF file (reference datasets.py:239-267
  reads these with netCDF4).

  netCDF4 is NOT installed in this environment; reader order is
  netCDF4 (NetCDF-4/HDF5) when available -> ``scipy.io.netcdf_file``
  (classic NetCDF-3) -> a sibling ``<path>.npz`` escape hatch holding the
  same variable name (for converted NetCDF-4 files).
  """
  if os.path.exists(path):
    try:
      from netCDF4 import Dataset as NetCDF
      ds = NetCDF(path)
      return np.asarray(ds[key])
    except Exception:
      pass
    try:
      from scipy.io import netcdf_file
      with netcdf_file(path, 'r', mmap=False) as ds:
        return np.asarray(ds.variables[key][:], np.float32)
    except Exception:
      pass
  npz = path + '.npz'
  if os.path.exists(npz):
    try:
      return np.asarray(np.load(npz)[key], np.float32)
    except Exception:
      return None
  return None


def get_dataset(config, uniform_dequantization: bool = False,
                evaluation: bool = False):
  """Create train/eval loaders (reference datasets.py:165-276).

  Returns ``(train_loader, eval_loader)`` yielding NHWC numpy batches.
  """
  batch_size = (config.training.batch_size if not evaluation
                else config.eval.batch_size)
  num_epochs = None if not evaluation else 1
  size = config.data.image_size
  name = config.data.dataset

  if name == 'CIFAR10':
    train_ds, test_ds = _torchvision_or_synthetic(
        'CIFAR10', size, config.data.num_channels, config.seed)
  elif name == 'SVHN':
    train_ds, test_ds = _torchvision_or_synthetic(
        'SVHN', size, config.data.num_channels, config.seed)
  elif name == 'CELEBA':
    train_ds, test_ds = _torchvision_or_synthetic(
        'CELEBA', size, config.data.num_channels, config.seed)
  elif name == 'LSUN':
    # Reference datasets.py:221-236: torchvision LSUN(classes=[category])
    # with resize_small+central_crop (128) / central_crop (otherwise).  No
    # LMDB files ship here, so the synthetic stand-in pattern applies; the
    # category is folded into the seed so bedroom/church differ.
    import zlib
    cat = str(getattr(config.data, 'category', 'bedroom'))
    cat_seed = config.seed + zlib.crc32(cat.encode()) % 997
    train_ds, test_ds = _torchvision_or_synthetic(
        'LSUN', size, config.data.num_channels, cat_seed)
  elif name in ('FFHQ', 'CelebAHQ'):
    # The reference *raises* for these ("no built-in from pytorch",
    # datasets.py:236-237).  Divergence: a synthetic stand-in (same pattern
    # as CIFAR) so the celebahq/ffhq NCSN++ configs are trainable here.
    train_ds, test_ds = _torchvision_or_synthetic(
        name, size, config.data.num_channels, config.seed)
  elif name in ('NC', 'NC_P'):
    path = (f'/data1/DATA_PUBLIC/Southern_Ocean/'
            f'bsose_i122_{config.data.date_range}_{config.data.category}.nc')
    alt = os.path.join(data_dir(), os.path.basename(path))
    data = _load_netcdf(path, config.data.key)
    if data is None:
      data = _load_netcdf(alt, config.data.key)
    if data is None:
      rng = np.random.default_rng(config.seed)
      data = _smooth_field(rng, (512, 1, 256 + config.data.land_cut, 256), 8)
      data = data.astype(np.float32)
    train_ds = NCDataset(data, size, 'train', config.data.land_cut, config.seed)
    test_ds = NCDataset(data, size, 'test', config.data.land_cut, config.seed + 1)
  elif name == 'PDE':
    path = '/data1/DATA_PUBLIC/40000-25-400-200.nc'
    alt = os.path.join(data_dir(), '40000-25-400-200.nc')
    data = _load_netcdf(path, 'data')
    if data is None:
      data = _load_netcdf(alt, 'data')
    if data is None:
      trim = int(getattr(config.data, 'time_trim', 300))
      n_frames = max(trim + 64, 400)
      data = _cached_ns_rollout(n_frames, 200, 2 * config.data.image_size,
                                config.seed)
    trim = int(getattr(config.data, 'time_trim', 160))
    train_ds = PDEDataset(data, size, 'train', trim, config.seed)
    test_ds = PDEDataset(data, size, 'test', trim, config.seed + 1)
  else:
    raise NotImplementedError(f'Dataset {name} not yet supported.')

  # Default 1: thread workers measured *slower* than serial under the GIL
  # (58 vs 52 ms/batch for CIFAR b128); the PrefetchLoader double-buffer
  # below is what actually hides host batch assembly (2 ms residual stall
  # vs a 74 ms consumer, BASELINE.md).
  num_workers = int(getattr(config.data, 'num_workers', 1))
  train_loader = NumpyLoader(train_ds, batch_size, shuffle=True,
                             seed=config.seed, num_workers=num_workers)
  test_loader = NumpyLoader(test_ds, batch_size, shuffle=False,
                            seed=config.seed + 1, num_epochs=num_epochs,
                            num_workers=num_workers)
  # Train side is the latency-critical consumer: double-buffer it so batch
  # assembly overlaps the device step (measured in BASELINE.md).  With
  # multi-step dispatch (tpu.steps_per_dispatch) the trainer drains K
  # batches at once — keep at least one full dispatch of batches buffered.
  depth = 2
  if 'tpu' in config:
    depth = max(2, int(config.tpu.get('steps_per_dispatch', 1)))
  return PrefetchLoader(train_loader, depth=depth), test_loader


class _ArrayImageDataset:
  """Indexable dataset over an in-memory (N, H, W, C) [0,1] image array."""

  def __init__(self, images: np.ndarray, labels: Optional[np.ndarray] = None):
    self.images = images
    self.labels = labels

  def __len__(self):
    return len(self.images)

  def __getitem__(self, i):
    label = int(self.labels[i]) if self.labels is not None else 0
    return self.images[i], label


def _load_cifar10_batches(root: str):
  """Native reader for the standard ``cifar-10-batches-py`` pickle layout
  (the reference reads it via torchvision, datasets.py:189-197; torchvision
  is not installed here, so the file format is read directly)."""
  import pickle
  base = os.path.join(root, 'cifar-10-batches-py')
  if not os.path.isdir(base):
    return None

  def read(names):
    data, labels = [], []
    for n in names:
      path = os.path.join(base, n)
      if not os.path.exists(path):
        continue
      with open(path, 'rb') as f:
        d = pickle.load(f, encoding='bytes')
      imgs = np.asarray(d[b'data'], np.uint8)
      batch_labels = d.get(b'labels', d.get(b'fine_labels'))
      if batch_labels is None:
        # Refuse rather than misalign: appending images while extending
        # labels by nothing would pair every later image with an earlier
        # batch's label and IndexError on the tail indices mid-training.
        raise ValueError(f'CIFAR-10 batch {n!r} has no labels key')
      if len(batch_labels) != len(imgs):
        raise ValueError(f'CIFAR-10 batch {n!r}: {len(imgs)} images vs '
                         f'{len(batch_labels)} labels')
      data.append(imgs)
      labels.extend(batch_labels)
    if not data:
      return None
    data = np.concatenate(data).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return (data.astype(np.float32) / 255.0, np.asarray(labels, np.int64))

  train = read([f'data_batch_{i}' for i in range(1, 6)])
  test = read(['test_batch'])
  if train is None or test is None:
    return None
  return (_ArrayImageDataset(*train), _ArrayImageDataset(*test))


def load_mnist_idx(root: str) -> Optional[np.ndarray]:
  """Native reader for MNIST ``train-images-idx3-ubyte[.gz]``: (N, 28, 28)
  uint8.  Looks under ``root`` and ``root/MNIST/raw``."""
  import gzip
  import struct
  for base in (root, os.path.join(root, 'MNIST', 'raw')):
    for name in ('train-images-idx3-ubyte', 'train-images-idx3-ubyte.gz'):
      path = os.path.join(base, name)
      if not os.path.exists(path):
        continue
      opener = gzip.open if name.endswith('.gz') else open
      with opener(path, 'rb') as f:
        magic, n, rows, cols = struct.unpack('>IIII', f.read(16))
        if magic != 2051:
          continue
        buf = f.read(n * rows * cols)
      return np.frombuffer(buf, np.uint8).reshape(n, rows, cols)
  return None


def _torchvision_or_synthetic(name: str, size: int, channels: int, seed: int):
  """Use local dataset files when present; else synthetic stand-in.

  CIFAR10 is read natively from the standard pickle batches (torchvision is
  not installed in this image); other torchvision formats fall through to
  torchvision when importable, then to the synthetic generator.
  """
  if name == 'CIFAR10':
    native = _load_cifar10_batches(data_dir())
    if native is not None:
      return native
  try:
    from torchvision import datasets as tvd  # noqa: F401
    # (No torchvision in this image; branch kept for environments that
    # carry it + the SVHN/CELEBA file formats.)
    del tvd
  except Exception:
    pass
  return (SyntheticImages(4096, size, channels, seed),
          SyntheticImages(512, size, channels, seed + 1))


# ---------------------------------------------------------------------------
# Mask datasets for inverse problems (reference datasets.py:279-300)
# ---------------------------------------------------------------------------

class MaskIterator:
  """Yields binary masks of shape (H, W, 1); one per `next()` call.

  Mirrors the reference mask loader (MNIST digits binarized, or random
  uniform masks thresholded at `ratio`; reference datasets.py:279-300).
  """

  def __init__(self, config, n_masks: int = 1600):
    self.size = config.data.image_size
    self.ratio = config.inverse.ratio
    self.invert = config.inverse.invert
    self.operator = config.inverse.operator
    self.rng = np.random.default_rng(config.seed + 12345)
    self.n_masks = n_masks
    self._mnist = self._try_load_mnist() if self.operator == 'inpaint' else None

  def _try_load_mnist(self):
    # Native idx reader (torchvision is not installed in this image).
    return load_mnist_idx(data_dir())

  def next(self) -> np.ndarray:
    if self._mnist is not None:
      idx = int(self.rng.integers(0, len(self._mnist)))
      img = np.asarray(self._mnist[idx], np.float32) / 255.0
      # Nearest-resize to image_size.
      ys = (np.arange(self.size) * img.shape[0] / self.size).astype(int)
      xs = (np.arange(self.size) * img.shape[1] / self.size).astype(int)
      img = img[np.ix_(ys, xs)]
    else:
      img = self.rng.random((self.size, self.size), np.float32)
    mask = img > self.ratio
    if not self.invert:
      mask = ~mask
    return mask.astype(np.float32)[..., None]


def get_mask_dataset(config) -> MaskIterator:
  return MaskIterator(config)
