"""A/B the fused Pallas Winograd kernel vs XLA direct conv on TPU.

Scanned chains with scalar readback (tunnel-safe timing, CLAUDE.md).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from b_pinn_kalman_filter_tpu.ops import winograd as wg
from b_pinn_kalman_filter_tpu.ops import winograd_pallas as wp


def fresh(shape, dtype=jnp.bfloat16):
  k = jax.random.PRNGKey(int(time.time_ns()) % 2 ** 31)
  return jax.random.normal(k, shape, dtype)


def timed(make_args, fn, n_iters, flops, label):
  fn = jax.jit(fn)
  np.asarray(fn(*make_args()))
  times = []
  for _ in range(3):
    args = make_args()
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    times.append(time.perf_counter() - t0)
  dt = min(times)
  print(json.dumps({'label': label, 'us_per_iter': round(dt / n_iters * 1e6, 1),
                    'tflops_per_s': round(flops * n_iters / dt / 1e12, 1)}),
        flush=True)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--iters', type=int, default=200)
  args = ap.parse_args()
  n = args.iters
  B = 64
  print(f'device: {jax.devices()[0].device_kind}', flush=True)

  for (H, Cin, Cout) in [(32, 128, 128), (16, 256, 256)]:
    kshape = (3, 3, Cin, Cout)
    direct_flops = 2 * B * H * H * 9 * Cin * Cout

    def direct_chain(x, k):
      def body(h, _):
        o = jax.lax.conv_general_dilated(
            h, k, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if Cout != Cin:
          reps = -(-Cin // Cout)
          o = jnp.concatenate([o] * reps, axis=-1)[..., :Cin]
        return o * 0.99, None
      h, _ = jax.lax.scan(body, x, None, length=n)
      return jnp.sum(h.astype(jnp.float32))

    def make_wino_chain(variant, bb):
      def wino_chain(x, k):
        U = wg.transform_kernel(k).reshape(16, Cin, Cout).astype(jnp.bfloat16)
        def body(h, _):
          o = wp.winograd_conv3x3_fused(h, U, variant=variant, batch_block=bb)
          if Cout != Cin:
            reps = -(-Cin // Cout)
            o = jnp.concatenate([o] * reps, axis=-1)[..., :Cin]
          return o * 0.99, None
        h, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(h.astype(jnp.float32))
      return wino_chain

    make = lambda H=H, Cin=Cin, ks=kshape: (fresh((B, H, H, Cin)),
                                            fresh(ks) * 0.1)
    timed(make, direct_chain, n, direct_flops,
          f'direct {H}x{H} {Cin}->{Cout}')
    for variant in ('dot1', 'dot3'):
      for bb in (0, 4):
        try:
          timed(make, make_wino_chain(variant, bb), n, direct_flops,
                f'wino[{variant},bb={bb}] {H}x{H} {Cin}->{Cout}')
        except Exception as e:
          print(f'wino[{variant},bb={bb}] {H}x{H}: FAILED {type(e).__name__}',
                flush=True)


if __name__ == '__main__':
  main()
