#!/bin/bash
# Run the staged chip-queue scripts sequentially on the real TPU, one
# process at a time (CLAUDE.md: a second TPU process blocks silently).
# Use after the tunnel watcher logs TUNNEL BACK.  Each item gets its own
# log under /root/repo/chip_logs/ (in-repo: a /tmp wipe or machine swap
# can't lose results) and a generous timeout sized for the server-side
# compile (~10-30 min per program, no persistent cache).
# Failures don't stop the queue; transcribe results into BASELINE.md.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p chip_logs
echo "=== queue run $(date -u +%Y-%m-%dT%H:%M:%SZ) ===" >> chip_logs/queue_status.log

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] start $(date +%H:%M:%S) (timeout ${tmo}s)" | tee -a chip_logs/queue_status.log
  timeout "$tmo" "$@" > "chip_logs/${name}.log" 2>&1
  echo "=== [$name] rc=$? end $(date +%H:%M:%S)" | tee -a chip_logs/queue_status.log
}

# Round-4 second queue: the guided fast posterior sampler (DPS x
# DPM-Solver++, inverse.solver='dpm') — new this round; writes its metric
# into BENCH_CACHE.json via the bench stage.  Earlier round-4 items (ukf,
# dps RK45, pinn refresh) all completed rc=0 (chip_logs/, BASELINE.md).
run dps_fast 3600 python bench.py --only dps_fast
echo "=== queue done $(date +%H:%M:%S)" | tee -a chip_logs/queue_status.log
