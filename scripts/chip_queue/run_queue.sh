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

# Round-4 order: the two round-3 failures first (ukf: Pallas correlation
# scoped-VMEM OOM under vmap, now XLA-fallback-guarded; dps: solver name
# case mismatch, now normalized), then a pinn cache refresh — the PINN
# metric can never run live inside the driver's bench budget (compile
# ~28 min), so BENCH_CACHE.json is its only driver-visible path and it is
# currently the stalest entry.  dpm + lfn passed round 3 (rc=0, logs kept).
run ukf  5400 python scripts/chip_queue/chip_ukf.py
run dps  3600 python scripts/chip_queue/chip_dps.py
run pinn 3600 python bench.py --only pinn
echo "=== queue done $(date +%H:%M:%S)" | tee -a chip_logs/queue_status.log
