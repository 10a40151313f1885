#!/bin/bash
# Round-4 phase-3 TPU evidence: the fast-mode parity column (VERDICT r4
# task 2) — the RECOMMENDED throughput flags (bf16 messages + per_epoch
# propagation + approx/bf16 full-catalog eval) head-to-head against the
# exact-fp32 torch oracle on the shared parity graph, 3 configs x 3 seeds.
# Run AFTER r4_tpu_phase1.sh (same chip).
set -u
cd "$(dirname "$0")/.."
LOG=runs/r4_phase3.log
{
if [ ! -f runs/parity/graph.npz ]; then
  echo "=== rebuild shared parity graph $(date +%T) ==="
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python scripts/parity_run.py build --out runs/parity/graph.npz
fi
for seed in 0 1 2; do
  for config in vanilla cu_message pop_neg; do
    echo "=== framework_fast $config seed $seed $(date +%T) ==="
    timeout 1800 python scripts/parity_run.py framework \
      --graph runs/parity/graph.npz --config $config --seed $seed \
      --fast --platform tpu \
      --out runs/parity/framework_fast.jsonl || echo "FAILED $config s$seed rc=$?"
  done
done
echo "=== PHASE3 DONE $(date +%T) ==="
} >> $LOG 2>&1
