#!/bin/bash
# Round-4 phase-4 CPU evidence: finish the fast-mode oracle matrix
# (seed 2 was killed mid-run last session), then the Stage-A cred-parity
# refresh (r4_cpu_phase2.sh), then the timing-sensitive 10M ingest bench
# LAST so it sees an idle host.
set -u
cd "$(dirname "$0")/.."
LOG=runs/r4_phase4.log
export JAX_PLATFORMS=cpu
{
if [ ! -f runs/parity/graph.npz ]; then
  echo "=== rebuild shared parity graph $(date +%T) ==="
  env -u PALLAS_AXON_POOL_IPS python scripts/parity_run.py build \
    --out runs/parity/graph.npz
fi
for config in vanilla cu_message pop_neg; do
  echo "=== oracle_full $config seed 2 $(date +%T) ==="
  timeout 3600 env -u PALLAS_AXON_POOL_IPS python scripts/parity_oracle.py \
    --graph runs/parity/graph.npz --config $config --seed 2 \
    --eval-mode full --out runs/parity/oracle_full.jsonl \
    || echo "FAILED oracle $config s2 rc=$?"
done
bash scripts/r4_cpu_phase2.sh
echo "=== PHASE4 DONE $(date +%T) ==="
} >> $LOG 2>&1
