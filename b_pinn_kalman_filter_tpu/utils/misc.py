"""Small utilities: throttled progress clock, image grids, memory report.

Reference: utils.py:7-23 (Clock, show_memory_usage); torchvision
make_grid/save_image replaced with a numpy implementation.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np


class Clock:
  """Throttled progress printer (reference utils.py:7-18)."""

  def __init__(self, interval: float = 10.0):
    self.interval = interval
    self.last = time.time()

  def tick(self, msg: str = '') -> bool:
    now = time.time()
    if now - self.last >= self.interval:
      self.last = now
      if msg:
        print(msg, flush=True)
      return True
    return False


def show_memory_usage(prefix: str = ''):
  """Per-device memory stats (reference utils.py:21-23 CUDA analog)."""
  for d in jax.local_devices():
    try:
      stats = d.memory_stats()
      used = stats.get('bytes_in_use', 0) / 2 ** 30
      limit = stats.get('bytes_limit', 0) / 2 ** 30
      print(f'{prefix}{d}: {used:.2f} / {limit:.2f} GiB', flush=True)
    except Exception:
      pass


def make_grid(images: np.ndarray, nrow: int, padding: int = 2) -> np.ndarray:
  """Tile a batch of HWC images into one grid image (torchvision analog)."""
  images = np.asarray(images)
  b, h, w, c = images.shape
  ncol = (b + nrow - 1) // nrow
  grid = np.zeros((ncol * (h + padding) + padding,
                   nrow * (w + padding) + padding, c), images.dtype)
  for i in range(b):
    r, col = divmod(i, nrow)
    y = r * (h + padding) + padding
    x = col * (w + padding) + padding
    grid[y:y + h, x:x + w] = images[i]
  return grid


def save_image_grid(images: np.ndarray, path: str, nrow: Optional[int] = None):
  """Save a batch of HWC float images in [0,1] as one PNG grid."""
  import imageio.v2 as imageio
  if nrow is None:
    nrow = int(np.sqrt(images.shape[0]))
  grid = make_grid(np.asarray(images), max(nrow, 1))
  grid = np.clip(grid * 255.0, 0, 255).astype(np.uint8)
  if grid.shape[-1] == 1:
    grid = grid[..., 0]
  imageio.imwrite(path, grid)
