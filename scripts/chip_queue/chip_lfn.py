"""LFN-PINN training on the real chip: pinn_pde_lfn config, reduced steps.
Evidence for VERDICT r2 Next #4's chip half -> BASELINE.md row."""
import time

import jax
import numpy as np

from b_pinn_kalman_filter_tpu import configs
from b_pinn_kalman_filter_tpu.data import get_dataset, get_mask_dataset
from b_pinn_kalman_filter_tpu.parallel import create_mesh, replicate, shard_batch
from b_pinn_kalman_filter_tpu.pinn import losses as pinn_losses
from b_pinn_kalman_filter_tpu.pinn import pinn_lib
from b_pinn_kalman_filter_tpu.train import state as state_lib

config = configs.get_config("pinn/pinn_pde_lfn")
config.training.batch_size = 16          # keep the chip run short
mesh = create_mesh(config)

print("devices:", jax.devices(), flush=True)
model, variables = pinn_lib.init_pinn(config, jax.random.PRNGKey(0))
n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables['params']))
print(f"LFN-PINN params: {n_params/1e6:.2f}M", flush=True)

train_ds, _ = get_dataset(config)
it = iter(train_ds)
mask = replicate(np.asarray(get_mask_dataset(config).next()), mesh)

# Phase 1 (prelim: flow+pressure data losses).
tx1 = pinn_losses.get_pinn_optimizer(config, lr_mul_pres=0.005)
state = replicate(state_lib.create_train_state(
    variables['params'], tx1, config.model.ema_rate), mesh)
step1 = jax.jit(pinn_losses.get_prelim_step_fn(config, model, tx1, train=True))
t0 = time.time()
losses_1 = []
for i in range(30):
  batch = shard_batch(pinn_lib.unbatch(next(it), mesh), mesh)
  state, (loss, vel_l, prs_l) = step1(jax.random.PRNGKey(i), state, mask, batch)
  losses_1.append(float(loss))
  if i in (0, 1):
    print(f"phase1 step {i}: loss {losses_1[-1]:.4f} "
          f"(elapsed {time.time()-t0:.0f}s)", flush=True)
print(f"phase1 losses: first3 {losses_1[:3]} last3 {losses_1[-3:]} "
      f"({time.time()-t0:.0f}s for 30 steps)", flush=True)

# Phase 2 (PINN: data + NS residual through the 6-level LiteFlowNet).
tx2 = pinn_losses.get_pinn_optimizer(config, lr_mul_pres=0.005)
state2 = state_lib.create_train_state(
    jax.device_get(state.params), tx2, config.model.ema_rate)
state2 = replicate(state2, mesh)
step2 = jax.jit(pinn_losses.get_pinn_step_fn(config, model, tx2, train=True))
t0 = time.time()
losses_2, pinn_ls = [], []
for i in range(10):
  batch = shard_batch(pinn_lib.unbatch(next(it), mesh), mesh)
  state2, (loss, pinn_l, data_l) = step2(jax.random.PRNGKey(100 + i), state2,
                                         mask, batch)
  losses_2.append(float(loss))
  pinn_ls.append(float(pinn_l))
  if i in (0, 1):
    print(f"phase2 step {i}: loss {losses_2[-1]:.4f} pinn {pinn_ls[-1]:.3e} "
          f"(elapsed {time.time()-t0:.0f}s)", flush=True)
print(f"phase2 losses: {losses_2}", flush=True)
print(f"phase2 NS-residual: {pinn_ls}", flush=True)
assert np.isfinite(losses_1).all() and np.isfinite(losses_2).all()
assert losses_1[-1] < losses_1[0], "phase-1 loss must decrease"
print("LFN_CHIP_OK", flush=True)
