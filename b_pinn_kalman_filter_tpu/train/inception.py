"""InceptionV3 feature extractor for FID/IS, pure JAX.

The reference's evaluation.py is a stub (its tfgan inception bodies are
commented out, reference evaluation.py:29-151); the FID protocol it points at
is the standard pool3-2048 InceptionV3.  This module implements the
torchvision ``Inception3`` topology as a pure-jnp forward over a flat
``{name: (kernel, bias)}`` parameter dict:

* BatchNorms are folded into the conv kernels at load time (inference-only),
  so the runtime graph is conv+bias+relu — one fused XLA op chain per layer.
* ``load_inception_params`` reads either a converted ``.npz`` or a raw
  torchvision ``inception_v3`` state_dict ``.pth`` (torch CPU load), from
  ``$BPKF_INCEPTION_WEIGHTS`` or ``$BPKF_DATA_DIR/inception_v3.{npz,pth}``.
* With no weights on disk (this environment has no egress), callers fall
  back to the random-feature proxy in ``evaluation.py`` — clearly labeled.
* Forward + converter are oracle-tested against an independently-built torch
  Inception3 (tests/torch_inception_oracle.py, eval-mode BatchNorm2d, NCHW)
  at 299^2 and on the resized-from-32^2 path (tests/test_evaluation.py).
* In-block average pools divide by the UNPADDED window count
  (count_include_pad=False) — the TF/FID-standard convention that
  pytorch-fid also patches raw torchvision to; deliberate divergence from
  torchvision's count_include_pad=True.

Layer/channel topology follows the public torchvision Inception3 definition
(Conv2d_1a..Mixed_7c + fc); features = 2048-dim global-avg pool, logits =
1000-way fc.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Params = Dict[str, Tuple[np.ndarray, np.ndarray]]

# (name, (kh, kw), cin, cout, stride, padding) for every conv, in forward
# order.  Padding is ((top,bottom),(left,right)).
_P0 = ((0, 0), (0, 0))


def _spec():
  s = []

  def c(name, k, cin, cout, stride=1, pad=_P0):
    s.append((name, k, cin, cout, stride, pad))

  c('Conv2d_1a_3x3', (3, 3), 3, 32, 2)
  c('Conv2d_2a_3x3', (3, 3), 32, 32)
  c('Conv2d_2b_3x3', (3, 3), 32, 64, 1, ((1, 1), (1, 1)))
  c('Conv2d_3b_1x1', (1, 1), 64, 80)
  c('Conv2d_4a_3x3', (3, 3), 80, 192)

  def inception_a(prefix, cin, pool_features):
    c(f'{prefix}.branch1x1', (1, 1), cin, 64)
    c(f'{prefix}.branch5x5_1', (1, 1), cin, 48)
    c(f'{prefix}.branch5x5_2', (5, 5), 48, 64, 1, ((2, 2), (2, 2)))
    c(f'{prefix}.branch3x3dbl_1', (1, 1), cin, 64)
    c(f'{prefix}.branch3x3dbl_2', (3, 3), 64, 96, 1, ((1, 1), (1, 1)))
    c(f'{prefix}.branch3x3dbl_3', (3, 3), 96, 96, 1, ((1, 1), (1, 1)))
    c(f'{prefix}.branch_pool', (1, 1), cin, pool_features)

  def inception_b(prefix, cin):
    c(f'{prefix}.branch3x3', (3, 3), cin, 384, 2)
    c(f'{prefix}.branch3x3dbl_1', (1, 1), cin, 64)
    c(f'{prefix}.branch3x3dbl_2', (3, 3), 64, 96, 1, ((1, 1), (1, 1)))
    c(f'{prefix}.branch3x3dbl_3', (3, 3), 96, 96, 2)

  def inception_c(prefix, cin, c7):
    c(f'{prefix}.branch1x1', (1, 1), cin, 192)
    c(f'{prefix}.branch7x7_1', (1, 1), cin, c7)
    c(f'{prefix}.branch7x7_2', (1, 7), c7, c7, 1, ((0, 0), (3, 3)))
    c(f'{prefix}.branch7x7_3', (7, 1), c7, 192, 1, ((3, 3), (0, 0)))
    c(f'{prefix}.branch7x7dbl_1', (1, 1), cin, c7)
    c(f'{prefix}.branch7x7dbl_2', (7, 1), c7, c7, 1, ((3, 3), (0, 0)))
    c(f'{prefix}.branch7x7dbl_3', (1, 7), c7, c7, 1, ((0, 0), (3, 3)))
    c(f'{prefix}.branch7x7dbl_4', (7, 1), c7, c7, 1, ((3, 3), (0, 0)))
    c(f'{prefix}.branch7x7dbl_5', (1, 7), c7, 192, 1, ((0, 0), (3, 3)))
    c(f'{prefix}.branch_pool', (1, 1), cin, 192)

  def inception_d(prefix, cin):
    c(f'{prefix}.branch3x3_1', (1, 1), cin, 192)
    c(f'{prefix}.branch3x3_2', (3, 3), 192, 320, 2)
    c(f'{prefix}.branch7x7x3_1', (1, 1), cin, 192)
    c(f'{prefix}.branch7x7x3_2', (1, 7), 192, 192, 1, ((0, 0), (3, 3)))
    c(f'{prefix}.branch7x7x3_3', (7, 1), 192, 192, 1, ((3, 3), (0, 0)))
    c(f'{prefix}.branch7x7x3_4', (3, 3), 192, 192, 2)

  def inception_e(prefix, cin):
    c(f'{prefix}.branch1x1', (1, 1), cin, 320)
    c(f'{prefix}.branch3x3_1', (1, 1), cin, 384)
    c(f'{prefix}.branch3x3_2a', (1, 3), 384, 384, 1, ((0, 0), (1, 1)))
    c(f'{prefix}.branch3x3_2b', (3, 1), 384, 384, 1, ((1, 1), (0, 0)))
    c(f'{prefix}.branch3x3dbl_1', (1, 1), cin, 448)
    c(f'{prefix}.branch3x3dbl_2', (3, 3), 448, 384, 1, ((1, 1), (1, 1)))
    c(f'{prefix}.branch3x3dbl_3a', (1, 3), 384, 384, 1, ((0, 0), (1, 1)))
    c(f'{prefix}.branch3x3dbl_3b', (3, 1), 384, 384, 1, ((1, 1), (0, 0)))
    c(f'{prefix}.branch_pool', (1, 1), cin, 192)

  inception_a('Mixed_5b', 192, 32)
  inception_a('Mixed_5c', 256, 64)
  inception_a('Mixed_5d', 288, 64)
  inception_b('Mixed_6a', 288)
  inception_c('Mixed_6b', 768, 128)
  inception_c('Mixed_6c', 768, 160)
  inception_c('Mixed_6d', 768, 160)
  inception_c('Mixed_6e', 768, 192)
  inception_d('Mixed_7a', 768)
  inception_e('Mixed_7b', 1280)
  inception_e('Mixed_7c', 2048)
  return s


CONV_SPEC = _spec()
_SPEC_BY_NAME = {name: (k, cin, cout, stride, pad)
                 for name, k, cin, cout, stride, pad in CONV_SPEC}
NUM_LOGITS = 1000
FEATURE_DIM = 2048


def random_inception_params(rng: Array) -> Params:
  """Correctly-shaped random parameters (hermetic tests + the random-proxy
  protocol driver).  He scaling (sqrt(2/fan_in)) — with 1/sqrt(fan_in) the
  ReLU stack halves activation variance per layer and the ~25-conv deepest
  path collapses features to ~0 (dead extractor: FID between any two image
  sets ~0, IS exactly 1 — observed on the first 50k-protocol dry-run)."""
  params = {}
  keys = jax.random.split(rng, len(CONV_SPEC) + 1)
  for key, (name, k, cin, cout, _, _) in zip(keys, CONV_SPEC):
    fan_in = k[0] * k[1] * cin
    w = np.asarray(jax.random.normal(key, k + (cin, cout))) * np.sqrt(
        2.0 / fan_in)
    params[name] = (w.astype(np.float32), np.zeros(cout, np.float32))
  wfc = np.asarray(jax.random.normal(keys[-1], (FEATURE_DIM, NUM_LOGITS)))
  params['fc'] = ((wfc / np.sqrt(FEATURE_DIM)).astype(np.float32),
                  np.zeros(NUM_LOGITS, np.float32))
  return params


def _conv(params, name: str, x: Array) -> Array:
  w, b = params[name]
  _, _, _, stride, pad = _SPEC_BY_NAME[name]
  y = jax.lax.conv_general_dilated(
      x, jnp.asarray(w), (stride, stride), pad,
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  return jax.nn.relu(y + jnp.asarray(b))


def _maxpool3s2(x):
  return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                               (1, 2, 2, 1), 'VALID')


def _avgpool3s1p1(x):
  s = jax.lax.reduce_window(x, 0., jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                            [(0, 0), (1, 1), (1, 1), (0, 0)])
  ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
  n = jax.lax.reduce_window(ones, 0., jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                            [(0, 0), (1, 1), (1, 1), (0, 0)])
  return s / n


def _inception_a(params, p, x):
  b1 = _conv(params, f'{p}.branch1x1', x)
  b5 = _conv(params, f'{p}.branch5x5_2', _conv(params, f'{p}.branch5x5_1', x))
  b3 = _conv(params, f'{p}.branch3x3dbl_3',
             _conv(params, f'{p}.branch3x3dbl_2',
                   _conv(params, f'{p}.branch3x3dbl_1', x)))
  bp = _conv(params, f'{p}.branch_pool', _avgpool3s1p1(x))
  return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(params, p, x):
  b3 = _conv(params, f'{p}.branch3x3', x)
  bd = _conv(params, f'{p}.branch3x3dbl_3',
             _conv(params, f'{p}.branch3x3dbl_2',
                   _conv(params, f'{p}.branch3x3dbl_1', x)))
  return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


def _inception_c(params, p, x):
  b1 = _conv(params, f'{p}.branch1x1', x)
  b7 = x
  for i in (1, 2, 3):
    b7 = _conv(params, f'{p}.branch7x7_{i}', b7)
  bd = x
  for i in (1, 2, 3, 4, 5):
    bd = _conv(params, f'{p}.branch7x7dbl_{i}', bd)
  bp = _conv(params, f'{p}.branch_pool', _avgpool3s1p1(x))
  return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(params, p, x):
  b3 = _conv(params, f'{p}.branch3x3_2', _conv(params, f'{p}.branch3x3_1', x))
  b7 = x
  for i in (1, 2, 3, 4):
    b7 = _conv(params, f'{p}.branch7x7x3_{i}', b7)
  return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


def _inception_e(params, p, x):
  b1 = _conv(params, f'{p}.branch1x1', x)
  b3 = _conv(params, f'{p}.branch3x3_1', x)
  b3 = jnp.concatenate([_conv(params, f'{p}.branch3x3_2a', b3),
                        _conv(params, f'{p}.branch3x3_2b', b3)], axis=-1)
  bd = _conv(params, f'{p}.branch3x3dbl_2',
             _conv(params, f'{p}.branch3x3dbl_1', x))
  bd = jnp.concatenate([_conv(params, f'{p}.branch3x3dbl_3a', bd),
                        _conv(params, f'{p}.branch3x3dbl_3b', bd)], axis=-1)
  bp = _conv(params, f'{p}.branch_pool', _avgpool3s1p1(x))
  return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_forward(params: Params, images: Array) -> Tuple[Array, Array]:
  """(B, H, W, C) images in [0, 1] -> (pool3 (B, 2048), logits (B, 1000)).

  Resizes to 299^2, maps to [-1, 1] (the TF/FID preprocessing convention),
  grayscale inputs are broadcast to 3 channels.
  """
  x = images.astype(jnp.float32)
  if x.shape[-1] == 1:
    x = jnp.repeat(x, 3, axis=-1)
  B = x.shape[0]
  if x.shape[1] != 299 or x.shape[2] != 299:
    x = jax.image.resize(x, (B, 299, 299, x.shape[-1]), 'bilinear',
                         antialias=False)
  x = x * 2.0 - 1.0

  for name in ('Conv2d_1a_3x3', 'Conv2d_2a_3x3', 'Conv2d_2b_3x3'):
    x = _conv(params, name, x)
  x = _maxpool3s2(x)
  x = _conv(params, 'Conv2d_3b_1x1', x)
  x = _conv(params, 'Conv2d_4a_3x3', x)
  x = _maxpool3s2(x)
  for p in ('Mixed_5b', 'Mixed_5c', 'Mixed_5d'):
    x = _inception_a(params, p, x)
  x = _inception_b(params, 'Mixed_6a', x)
  for p in ('Mixed_6b', 'Mixed_6c', 'Mixed_6d', 'Mixed_6e'):
    x = _inception_c(params, p, x)
  x = _inception_d(params, 'Mixed_7a', x)
  x = _inception_e(params, 'Mixed_7b', x)
  x = _inception_e(params, 'Mixed_7c', x)

  pool = jnp.mean(x, axis=(1, 2))
  wfc, bfc = params['fc']
  logits = pool @ jnp.asarray(wfc) + jnp.asarray(bfc)
  return pool, logits


# ---------------------------------------------------------------------------
# Weight loading (torchvision state_dict .pth or converted .npz)
# ---------------------------------------------------------------------------

def _fold_bn(w_oihw: np.ndarray, gamma, beta, mean, var,
             eps: float = 1e-3) -> Tuple[np.ndarray, np.ndarray]:
  """Fold conv+BN into conv+bias; returns (HWIO kernel, bias)."""
  scale = gamma / np.sqrt(var + eps)
  w = w_oihw * scale[:, None, None, None]
  b = beta - mean * scale
  return w.transpose(2, 3, 1, 0).astype(np.float32), b.astype(np.float32)


def params_from_torch_state_dict(sd) -> Params:
  """Convert a torchvision ``inception_v3`` state_dict (BN folded)."""
  def a(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, 'detach') else t)

  params: Params = {}
  for name, *_ in CONV_SPEC:
    params[name] = _fold_bn(
        a(sd[f'{name}.conv.weight']),
        a(sd[f'{name}.bn.weight']), a(sd[f'{name}.bn.bias']),
        a(sd[f'{name}.bn.running_mean']), a(sd[f'{name}.bn.running_var']))
  params['fc'] = (a(sd['fc.weight']).T.astype(np.float32),
                  a(sd['fc.bias']).astype(np.float32))
  return params


def save_params_npz(params: Params, path: str) -> None:
  flat = {}
  for name, (w, b) in params.items():
    flat[f'{name}/w'] = w
    flat[f'{name}/b'] = b
  np.savez_compressed(path, **flat)


def load_params_npz(path: str) -> Params:
  data = np.load(path)
  names = sorted({k.rsplit('/', 1)[0] for k in data.files})
  return {n: (data[f'{n}/w'], data[f'{n}/b']) for n in names}


def load_inception_params(path: Optional[str] = None) -> Optional[Params]:
  """Load InceptionV3 params from disk; None when no weights exist.

  Search order: explicit ``path`` → ``$BPKF_INCEPTION_WEIGHTS`` →
  ``$BPKF_DATA_DIR/inception_v3.{npz,pth}``.
  """
  from b_pinn_kalman_filter_tpu.data.datasets import data_dir
  candidates = []
  if path:
    candidates.append(path)
  env = os.environ.get('BPKF_INCEPTION_WEIGHTS')
  if env:
    candidates.append(env)
  candidates += [os.path.join(data_dir(), 'inception_v3.npz'),
                 os.path.join(data_dir(), 'inception_v3.pth')]
  for cand in candidates:
    if not os.path.exists(cand):
      continue
    if cand.endswith('.npz'):
      return load_params_npz(cand)
    try:
      import torch
      sd = torch.load(cand, map_location='cpu', weights_only=True)
      if hasattr(sd, 'state_dict'):
        sd = sd.state_dict()
      return params_from_torch_state_dict(sd)
    except Exception:
      continue
  return None


def make_inception_feature_fn(params: Params, batch: int = 128):
  """Chunked ``feature_fn(images) -> (pool (N,2048), logits (N,1000))``.

  Inputs larger than ``batch`` are streamed through a fixed-shape jitted
  forward in ``batch``-sized chunks (tail chunk zero-padded so ONE compiled
  program serves every call — remote TPU compiles are minutes each).  This
  is a protocol-scale requirement, not an optimization: at 299^2 the early
  Inception layers hold ~23 MB of activations per image, so feeding a whole
  50k-FID sampling round (eval.batch_size images) through one program would
  exceed HBM.  Chunk results are read back to host as they complete, so
  device memory stays O(batch) regardless of N.
  """
  fwd = jax.jit(functools.partial(inception_forward, params))

  def feature_fn(images):
    images = jnp.asarray(images)
    n = images.shape[0]
    if n <= batch:
      return fwd(images)
    pools, logits = [], []
    for i in range(0, n, batch):
      chunk = images[i:i + batch]
      valid = chunk.shape[0]
      if valid < batch:
        pad = jnp.zeros((batch - valid,) + tuple(chunk.shape[1:]), chunk.dtype)
        chunk = jnp.concatenate([chunk, pad])
      p, l = fwd(chunk)
      pools.append(np.asarray(p)[:valid])
      logits.append(np.asarray(l)[:valid])
    return np.concatenate(pools), np.concatenate(logits)

  return feature_fn
