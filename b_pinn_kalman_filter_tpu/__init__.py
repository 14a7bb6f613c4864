"""b_pinn_kalman_filter_tpu — a TPU-native (JAX/XLA/Pallas) framework for
score-SDE generative modeling, Bayesian PINN flow inference, and
Unscented-Kalman-filter state estimation.

A from-scratch, TPU-first redesign with the capabilities of the reference
CUDA/PyTorch stack `XDzzzzzZyq/b-pinn-kalman-filter`:

* ``core``      — SDE math (VP/subVP/VE), losses, PC/ODE samplers, likelihood.
* ``ops``       — Pallas/XLA kernels: upfirdn2d, fused_bias_act, correlation
                  cost volumes, differentiable grid_sample, Navier–Stokes step.
* ``models``    — flax score networks (DDPM U-Net, NCSN++, NCSNv2), optical
                  flow nets (FlowNet, LiteFlowNet), PressureNet, Bayesian nets.
* ``pinn``      — PINN / B-PINN physics-informed training (NS residuals via
                  jax.grad), MOPED Bayesian bootstrap.
* ``kalman``    — square-root UKF vmapped over patches, NS dynamics models.
* ``inverse``   — linear observation operators, DPS / controlled samplers.
* ``parallel``  — device mesh + NamedSharding utilities (the DP/TP story).
* ``data``      — datasets, synthetic NS simulation data, masks, scalers.
* ``train``     — train loops, TrainState with in-pytree EMA, checkpointing.
"""

__version__ = "0.1.0"
