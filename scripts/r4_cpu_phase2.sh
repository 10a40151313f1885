#!/bin/bash
# Round-4 phase-2 CPU evidence: Stage-A cred-parity pipeline refresh (new
# slas default + percentile verdict) and the 10M ingest measurement.
set -u
cd "$(dirname "$0")/.."
LOG=runs/r4_phase2.log
export JAX_PLATFORMS=cpu
{
echo "=== cred parity build $(date +%T) ==="
timeout 1800 env -u PALLAS_AXON_POOL_IPS python scripts/cred_parity_run.py build || echo "FAILED build"
echo "=== cred oracle $(date +%T) ==="
timeout 10800 env -u PALLAS_AXON_POOL_IPS python scripts/cred_parity_run.py oracle || echo "FAILED oracle"
for mode in full_graph slas; do
  echo "=== cred framework $mode $(date +%T) ==="
  timeout 7200 env -u PALLAS_AXON_POOL_IPS python scripts/cred_parity_run.py framework --mode $mode || echo "FAILED $mode"
done
echo "=== cred downstream $(date +%T) ==="
timeout 14400 env -u PALLAS_AXON_POOL_IPS python scripts/cred_parity_run.py downstream || echo "FAILED downstream"
echo "=== cred report $(date +%T) ==="
env -u PALLAS_AXON_POOL_IPS python scripts/cred_parity_run.py report || echo "FAILED report"
echo "=== ingest bench $(date +%T) ==="
timeout 7200 env -u PALLAS_AXON_POOL_IPS python scripts/ingest_bench.py || echo "FAILED ingest"
echo "=== PHASE2 DONE $(date +%T) ==="
} >> $LOG 2>&1
