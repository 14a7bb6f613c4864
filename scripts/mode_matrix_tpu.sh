#!/bin/bash
# Drive the CLI mode matrix on the real TPU with small overrides — the
# round-2 regression check that every mode still runs end-to-end after
# the model/layers changes.  Writes per-mode logs under /tmp/modes/.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
W=/tmp/modes
mkdir -p $W
CFG=b_pinn_kalman_filter_tpu/configs/vp/cifar10_ddpmpp_continuous.py
SMALL="--config.model.nf=32 --config.model.num_res_blocks=2 --config.model.num_scales=100 --config.training.batch_size=32 --config.data.image_size=16"

run() {
  name=$1; shift
  echo "=== $name: $*"
  timeout 1500 python main.py "$@" > $W/$name.log 2>&1
  echo "$name exit=$?"
}

run train --config=$CFG --workdir=$W/train --mode=train $SMALL \
    --config.training.n_iters=60 --config.training.snapshot_freq=50 \
    --config.training.snapshot_freq_for_preemption=50 \
    --config.training.eval_freq=20 --config.training.log_freq=10

CKPT=$(ls -d $W/train/checkpoints/checkpoint_* 2>/dev/null | head -1)
echo "ckpt: $CKPT"
run sample --config=$CFG --workdir=$W/sample --mode=sample $SMALL \
    --ckptdir="$CKPT" --config.eval.batch_size=16
run eval --config=$CFG --workdir=$W/train --mode=eval $SMALL \
    --eval_folder=evald --config.eval.batch_size=16 \
    --config.eval.begin_ckpt=1 --config.eval.end_ckpt=1 \
    --config.eval.enable_bpd=false --config.eval.enable_sampling=true \
    --config.eval.num_samples=16
run simulate --config=b_pinn_kalman_filter_tpu/configs/pinn/pinn_pde.py \
    --workdir=$W/sim --mode=simulate --config.data.image_size=32 \
    
run ukf --config=b_pinn_kalman_filter_tpu/configs/pinn/pinn_pde.py \
    --workdir=$W/ukf --mode=ukf --config.data.image_size=16 \
    --config.kf.patch_size=4 --config.model.feature_nums='(8,16,32)'
echo "=== done; tail of each log:"
for f in $W/*.log; do echo "--- $f"; grep -v WARNING $f | tail -3; done
