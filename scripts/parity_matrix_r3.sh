#!/bin/bash
# Round-3 parity matrix: the four configs never oracle-verified before
# (VERDICT round 2, item 1).  Appends to runs/parity/{oracle,framework}.jsonl
# alongside the round-2 vanilla/cu_message/pop_neg records.
set -u
cd "$(dirname "$0")/.."
G=runs/parity/graph.npz
CRED=runs/parity/cred.npy

for seed in 0 1 2; do
  for cfg in cred_eq322 cred_eq322_fair degree_aware pop_extended; do
    CR=""
    case $cfg in cred_eq322|cred_eq322_fair) CR="--cred $CRED";; esac
    echo "=== framework $cfg seed $seed ===" >> runs/parity/framework.log
    timeout 1800 python scripts/parity_run.py framework --graph $G \
      --config $cfg --seed $seed --epochs 200 --eval-every 2 \
      --out runs/parity/framework.jsonl >> runs/parity/framework.log 2>&1
    echo "=== oracle $cfg seed $seed ===" >> runs/parity/oracle.log
    timeout 3600 python scripts/parity_oracle.py --graph $G \
      --config $cfg --seed $seed --epochs 200 --eval-every 2 $CR \
      --out runs/parity/oracle.jsonl >> runs/parity/oracle.log 2>&1
    echo "done $cfg seed $seed rc=$?"
  done
done
echo ALL DONE
