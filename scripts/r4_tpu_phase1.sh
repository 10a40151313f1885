#!/bin/bash
# Round-4 phase-1 TPU evidence (timing-sensitive; run with host otherwise idle):
# eval-equivalence triplet + overlap + scaling terms + schedule compare.
set -u
cd "$(dirname "$0")/.."
LOG=runs/r4_phase1.log
{
for mode in exact approx bf16; do
  echo "=== triplet $mode $(date +%T) ==="
  timeout 3600 python scripts/eval_equiv_r4.py train --mode $mode || echo "FAILED $mode rc=$?"
done
echo "=== overlap $(date +%T) ==="
timeout 3600 python scripts/eval_equiv_r4.py overlap || echo "FAILED overlap rc=$?"
python scripts/eval_equiv_r4.py report || true
echo "=== scaling terms $(date +%T) ==="
timeout 1800 python scripts/probe_scaling_terms.py || echo "FAILED terms rc=$?"
echo "=== schedule compare $(date +%T) ==="
timeout 3600 python scripts/schedule_compare.py 12 || echo "FAILED schedule rc=$?"
echo "=== PHASE1 DONE $(date +%T) ==="
} >> $LOG 2>&1
