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

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] start $(date +%H:%M:%S) (timeout ${tmo}s)" | tee -a chip_logs/queue_status.log
  timeout "$tmo" "$@" > "chip_logs/${name}.log" 2>&1
  echo "=== [$name] rc=$? end $(date +%H:%M:%S)" | tee -a chip_logs/queue_status.log
}

# Order: dpm first — cheapest item and it write-through caches its metric
# into BENCH_CACHE.json, so the driver-visible record gains the
# beyond-parity row even if a later outage cuts the queue short.  Then the
# parity-evidence runs (lfn = last partial component P19), then the
# re-measures.
run dpm  3600 python bench.py --only dpm
run lfn  7200 python scripts/chip_queue/chip_lfn.py
run ukf  5400 python scripts/chip_queue/chip_ukf.py
run dps  3600 python scripts/chip_queue/chip_dps.py
echo "=== queue done $(date +%H:%M:%S)" | tee -a chip_logs/queue_status.log
