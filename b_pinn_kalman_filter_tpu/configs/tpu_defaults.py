"""TPU-execution defaults shared by every config (no reference analog).

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(reference: models/utils.py:93).  Here the equivalent is a JAX device mesh with
batch sharding; these knobs configure it.
"""

import ml_collections


def add_tpu_defaults(config: ml_collections.ConfigDict) -> ml_collections.ConfigDict:
  tpu = config.tpu = ml_collections.ConfigDict()
  # Data-parallel axis size; -1 = all local devices.
  tpu.data_axis = -1
  # Mesh axis names: data parallel is the only one the reference semantics
  # need; fsdp axis kept for large models (params sharded over it).
  tpu.mesh_shape = (-1, 1)        # (dp, fsdp)
  tpu.compute_dtype = 'bfloat16'  # MXU-native matmul/conv dtype
  tpu.param_dtype = 'float32'
  tpu.remat = False               # jax.checkpoint the U-Net stages
  # Winograd F(2x2,3x3) for stride-1 3x3 convs (ops/winograd.py): same
  # convolution, 2.25x fewer MXU multiplies.  Off by default: measured
  # end-to-end on TPU v5e the transform overhead loses to XLA's direct
  # conv (12.2 vs 9.3 ms/step on the DDPM++ sampler; the kernel only wins
  # in isolation at 16x16/256ch, see BASELINE.md).
  tpu.winograd = False
  # Fused GroupNorm+activation Pallas kernel on the resblocks
  # (ops/groupnorm_pallas.py).  Off by default: measured slower end-to-end
  # (12.4 vs 9.4 ms/step) — pallas_call fusion barriers cost more than
  # XLA's already-fused norm chain saves (BASELINE.md round 2).
  tpu.fused_groupnorm = False
  tpu.donate_state = True
  # PINN phase-2 residual gradients: chunk size for microbatched gradient
  # accumulation over the batch (pinn/losses.py:get_pinn_step_fn).  0 =
  # full-batch literal nested grads; C > 0 scans B/C chunks of the fused
  # shared-vjp/HVP residual schedule (exact same values/grads, fewer
  # network passes, live graph bounded by C — the schedule that OOMs
  # full-batch fits this way).
  tpu.pinn_microbatch = 0
  # Bundle event-free training steps into one lax.scan dispatch
  # (run_lib.train).  1 = reference step-at-a-time semantics; raise when
  # per-dispatch latency matters (e.g. 32 hides the ~40 ms tunnel
  # round-trip measured in BASELINE.md).  Log/eval/snapshot cadence is
  # preserved exactly at any value.
  tpu.steps_per_dispatch = 1
  config.device = 'tpu'
  # Sampling-block extensions (defaults match the `.get()` fallbacks in
  # core/sampling.py).  Declared here so `--config.sampling.dpm_steps=...`
  # works through main.py's lock_config=True CLI (a key absent from the
  # tree cannot be set on a locked config).
  if 'sampling' in config:
    config.sampling.dpm_steps = 20      # DPM-Solver++ fast sampler NFE
    config.sampling.dpm_order = 2       # 1 = DDIM, 2 = multistep 2M
    config.sampling.dpm_skip = 'logsnr' # or 'time' (= PC grid spacing)
    config.sampling.pc_chunks = 0       # 0 = single-dispatch PC scan
  if 'eval' in config:
    # FID/KID reference-set size (run_lib.evaluate); declared so
    # `--config.eval.num_ref_images=...` works through the locked CLI.
    # The 50k-protocol chip run used 10000 (the full CIFAR eval split).
    config.eval.num_ref_images = 2048
    # Use the full InceptionV3 architecture with seed-fixed random weights
    # when no pretrained weights exist (labeled inception_v3_random_proxy);
    # default False = the small random-CNN proxy.
    config.eval.inception_random_init = False
  return config


def add_inverse_extensions(inverse: ml_collections.ConfigDict
                           ) -> ml_collections.ConfigDict:
  """Solver extensions for `config.inverse` blocks that run conditional
  sampling (defaults match the `.get()` fallbacks in
  inverse/conditional_sampling.py); declared so the knobs are settable
  through the locked CLI config."""
  inverse.fixed_steps = 5000            # 'fixed' Euler steps (reference)
  inverse.dpm_steps = 50                # guided DPM-Solver++ fast DPS NFE
  inverse.dpm_order = 2
  inverse.dpm_skip = 'logsnr'
  return inverse
