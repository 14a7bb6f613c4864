"""Time-breakdown microbenchmarks for the PC sampler hot path.

Isolates: (a) pure 3x3 bf16 conv throughput ceiling on this chip,
(b) model forward alone vs full PC step, (c) GroupNorm+SiLU chain,
(d) attention chain, (e) RNG/EM arithmetic.

Measurement discipline (CLAUDE.md): the tunnel memoizes identical calls and
readback bandwidth is ~16-20 MB/s, so every chain reduces its result to a
SCALAR before returning and every run uses fresh time-derived inputs.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(make_args, fn, n_iters, flops_per_iter=None, label=''):
  fn = jax.jit(fn)
  np.asarray(fn(*make_args()))  # compile+warmup
  times = []
  for _ in range(3):
    args = make_args()
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    times.append(time.perf_counter() - t0)
  dt = min(times)
  rec = {'label': label, 'ms_per_iter': round(dt / n_iters * 1e3, 4),
         'total_s': round(dt, 4)}
  if flops_per_iter:
    rec['tflops_per_s'] = round(flops_per_iter * n_iters / dt / 1e12, 1)
  print(json.dumps(rec), flush=True)
  return dt / n_iters


def fresh(shape, dtype=jnp.bfloat16):
  k = jax.random.PRNGKey(int(time.time_ns()) % 2 ** 31)
  return jax.random.normal(k, shape, dtype)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--iters', type=int, default=200)
  args = ap.parse_args()
  n = args.iters
  B = 64

  dev = jax.devices()[0]
  print(f'device: {dev.platform} {dev.device_kind}', flush=True)

  # (a) pure conv chains at the three resolutions that dominate the U-Net.
  for (H, C) in [(32, 128), (16, 256), (8, 256)]:
    def chain(x, k):
      def body(h, _):
        h = jax.lax.conv_general_dilated(
            h, k, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return h * 0.999, None
      h, _ = jax.lax.scan(body, x, None, length=n)
      return jnp.sum(h.astype(jnp.float32))

    flops = 2 * B * H * H * 9 * C * C
    timed(lambda H=H, C=C: (fresh((B, H, H, C)), fresh((3, 3, C, C))),
          chain, n_iters=n, flops_per_iter=flops,
          label=f'conv3x3 {H}x{H} C={C} bf16')

  # (a2) equivalent matmul (the implicit-GEMM shape of the 32^2 conv):
  # M=B*H*W, K=9*C, N=C — isolates conv-lowering overhead vs a raw GEMM.
  M, K, N = B * 32 * 32, 9 * 128, 128
  def mm_chain(a, w):
    def body(h, _):
      o = jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
      # fold N=128 back to K=1152 shape by tiling (keeps a square-ish chain)
      return jnp.tile(o.astype(jnp.bfloat16), (1, 9)) * 0.999, None
    h, _ = jax.lax.scan(body, a, None, length=n)
    return jnp.sum(h.astype(jnp.float32))
  timed(lambda: (fresh((M, K)), fresh((K, N))), mm_chain, n_iters=n,
        flops_per_iter=2 * M * K * N, label=f'matmul {M}x{K}x{N} bf16')

  # (b) GroupNorm + SiLU chain at 32^2 C=128 (f32 stats, bf16 data).
  def gn_chain(x, scale, bias):
    def body(h, _):
      h32 = h.astype(jnp.float32).reshape(B, 32 * 32, 32, 4)
      mean = h32.mean(axis=(1, 3), keepdims=True)
      var = h32.var(axis=(1, 3), keepdims=True)
      h32 = (h32 - mean) * jax.lax.rsqrt(var + 1e-6)
      h32 = h32.reshape(B, 32, 32, 128) * scale + bias
      return jax.nn.silu(h32).astype(jnp.bfloat16), None
    h, _ = jax.lax.scan(body, x, None, length=n)
    return jnp.sum(h.astype(jnp.float32))

  timed(lambda: (fresh((B, 32, 32, 128)), jnp.ones((128,), jnp.float32),
                 jnp.zeros((128,), jnp.float32)),
        gn_chain, n_iters=n, label='GN+SiLU 32x32 C=128')

  # (c) attention block at 16^2 C=256 (the only attention in DDPM++).
  def attn_chain(x):
    def body(h, _):
      w = jnp.einsum('bqc,bkc->bqk', h, h,
                     preferred_element_type=jnp.float32) * (256 ** -0.5)
      w = jax.nn.softmax(w, axis=-1)
      o = jnp.einsum('bqk,bkc->bqc', w, h.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
      return o.astype(jnp.bfloat16) * 0.999, None
    h, _ = jax.lax.scan(body, x, None, length=n)
    return jnp.sum(h.astype(jnp.float32))

  timed(lambda: (fresh((B, 256, 256)),), attn_chain, n_iters=n,
        label='attention 16x16 C=256')

  # (d) model forward alone, scanned (vs full PC step from perf_sweep).
  from b_pinn_kalman_filter_tpu import configs, models as mutils
  config = configs.get_config('vp/cifar10_ddpmpp_continuous')
  rng = jax.random.PRNGKey(0)
  model, variables = mutils.init_model(rng, config)
  params = variables['params']

  def model_chain(x, params):
    def body(h, t):
      labels = jnp.full((B,), t * 999.0)
      out = model.apply({'params': params}, h, labels, train=False)
      return out * 0.01, None
    h, _ = jax.lax.scan(body, x, jnp.linspace(1.0, 1e-3, n))
    return jnp.sum(h)

  timed(lambda: (fresh((B, 32, 32, 3), jnp.float32), params),
        model_chain, n_iters=n, flops_per_iter=18.9e9 * B,
        label='U-Net forward only')

  # (e) RNG + predictor arithmetic alone (no model): EM update pieces.
  def pred_chain(x, rng):
    def body(h, step_rng):
      z = jax.random.normal(step_rng, h.shape)
      h = h * 0.999 + 0.01 * z
      return h, None
    h, _ = jax.lax.scan(body, x, jax.random.split(rng, n))
    return jnp.sum(h)

  timed(lambda: (fresh((B, 32, 32, 3), jnp.float32),
                 jax.random.PRNGKey(int(time.time_ns()) % 2 ** 31)),
        pred_chain, n_iters=n, label='RNG+EM arithmetic only')


if __name__ == '__main__':
  main()
