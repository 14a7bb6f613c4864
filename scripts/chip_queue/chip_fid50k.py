"""The reference FID eval protocol at full scale, once, on the real chip.

VERDICT r4 Next #3: run_lib.evaluate's machinery is unit-tested but the
protocol scale — 50,000 generated samples streamed through the InceptionV3
feature path, reference stats cached, FID/KID/IS assembled — had never been
executed where it will actually be used.  This drives the REAL
`run_lib.evaluate` entry (reference run_lib.py:281-404 + the
configs/default_cifar10_configs.py:33-36 eval protocol) end-to-end:

* Generation: `sampling.method='dpm_solver'` (~20 NFE) so 50k samples fit a
  chip window; NFE semantics diverge from the reference's N=1000 PC sampler
  by design — that divergence is the recorded caveat, sample QUALITY at 20
  NFE is validated separately (scripts/dpm_quality_check.py).
* Features: the real InceptionV3 architecture (299^2 resize, pool3-2048)
  with seed-fixed random init (`BPKF_INCEPTION_RANDOM_INIT=1`) — this
  environment has no egress for the published weights, so every metric is
  honestly labeled `inception_v3_random_proxy`.  The compute/memory path —
  uploads, 299^2 resize, chunked streaming (train/inception.py
  make_inception_feature_fn), per-round feature accumulation, 2048x2048
  covariance assembly — is exactly the real protocol's.
* Model: fresh random init (no trained 50k-step checkpoint exists in this
  environment); the protocol-scale behavior under test (wall-clock, memory,
  streaming, stats caching) does not depend on sample quality.

eval.batch_size 512 (not the reference's 1024, which is 8xV100 aggregate =
128/device; 512/chip keeps the batch-wide U-Net forward comfortably inside
the 16 GB HBM).  Records per-phase wall-clock + host peak RSS for
BASELINE.md.
"""
import os
import resource
import time

os.environ.setdefault('BPKF_INCEPTION_RANDOM_INIT', '1')

import jax

# Honor an explicit CPU request (the axon plugin ignores the env var alone;
# CLAUDE.md): lets the same script dry-run off-chip without touching the
# (single-tenant) TPU tunnel.
if os.environ.get('JAX_PLATFORMS') == 'cpu':
  jax.config.update('jax_platforms', 'cpu')

import numpy as np

from b_pinn_kalman_filter_tpu import configs
from b_pinn_kalman_filter_tpu import models as mutils
from b_pinn_kalman_filter_tpu.core import losses
from b_pinn_kalman_filter_tpu.train import checkpoint as ckpt_lib
from b_pinn_kalman_filter_tpu.train import run_lib
from b_pinn_kalman_filter_tpu.train import state as state_lib

WORKDIR = os.environ.get('FID_WORKDIR', '/tmp/fid50k')
NUM_SAMPLES = int(os.environ.get('FID_NUM_SAMPLES', '50000'))
BATCH = int(os.environ.get('FID_BATCH', '512'))

config = configs.get_config("vp/cifar10_ddpmpp_continuous")
config.eval.begin_ckpt = 1
config.eval.end_ckpt = 1
config.eval.enable_loss = False
config.eval.enable_bpd = False
config.eval.enable_sampling = True
config.eval.num_samples = NUM_SAMPLES
config.eval.batch_size = BATCH
config.eval.num_ref_images = int(os.environ.get('FID_REF_IMAGES', '10000'))
config.eval.inception_random_init = True  # declared switch (env is fallback)
config.sampling.method = 'dpm_solver'
if os.environ.get('FID_TINY'):  # CPU wiring dry-run: shrink the model
  config.model.nf = 32
  config.model.ch_mult = (1, 2)
  config.model.num_res_blocks = 1
  config.model.attn_resolutions = (16,)
  config.sampling.dpm_steps = 5

print("devices:", jax.devices(), "num_samples", NUM_SAMPLES,
      "batch", BATCH, "sampler", config.sampling.method,
      "dpm_steps", config.sampling.dpm_steps, flush=True)

# Stage a checkpoint for evaluate() to restore: fresh random init (no
# trained reference-scale checkpoint exists in this environment).
ckpt_path = os.path.join(WORKDIR, 'checkpoints', 'checkpoint_1')
if not os.path.exists(ckpt_path):
  model, variables = mutils.init_model(jax.random.PRNGKey(0), config)
  tx = losses.get_optimizer(config)
  state = state_lib.create_train_state(variables['params'], tx,
                                       config.model.ema_rate)
  os.makedirs(os.path.dirname(ckpt_path), exist_ok=True)
  ckpt_lib.save_checkpoint(ckpt_path, jax.device_get(state))
  print("staged random-init checkpoint_1", flush=True)

t0 = time.time()
results = run_lib.evaluate(config, WORKDIR, eval_folder="eval")
wall = time.time() - t0
peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

def _fmt(v):
  # results keys can be absent (e.g. a corrupt staged checkpoint makes
  # evaluate() skip ckpt_1); never let the final status line raise.
  return f"{v:.5g}" if isinstance(v, float) else str(v)


print("results:", {k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in results.items()}, flush=True)
print(f"FID50K_CHIP_OK wall={wall:.0f}s samples={NUM_SAMPLES} "
      f"batch={BATCH} rounds={NUM_SAMPLES // BATCH + 1} "
      f"peak_host_rss={peak_rss_gb:.2f}GB "
      f"features={results.get('feature_source')} "
      f"fid={_fmt(results.get('ckpt_1_fid'))} "
      f"kid={_fmt(results.get('ckpt_1_kid'))} "
      f"is={_fmt(results.get('ckpt_1_inception_score'))}", flush=True)
