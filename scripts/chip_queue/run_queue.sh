#!/bin/bash
# Run the staged chip-queue scripts sequentially on the real TPU, one
# process at a time (CLAUDE.md: a second TPU process blocks silently).
# Use after the tunnel watcher logs TUNNEL BACK.  Each item gets its own
# log under /tmp/chip_queue_<name>.log and a generous timeout sized for
# the server-side compile (~10-30 min per program, no persistent cache).
# Failures don't stop the queue; transcribe results into BASELINE.md.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] start $(date +%H:%M:%S) (timeout ${tmo}s)"
  timeout "$tmo" "$@" > "/tmp/chip_queue_${name}.log" 2>&1
  echo "=== [$name] rc=$? end $(date +%H:%M:%S)"
}

# Priority order (BASELINE.md queue): parity evidence first, then the
# beyond-parity dpm cache number, then a full bench refresh.
run lfn  7200 python scripts/chip_queue/chip_lfn.py
run ukf  5400 python scripts/chip_queue/chip_ukf.py
run dps  3600 python scripts/chip_queue/chip_dps.py
run dpm  3600 python bench.py --only dpm
echo "=== queue done $(date +%H:%M:%S)"
