"""Reference regression runner.

Reproduces the protocol of the six captured reference runs (SURVEY.md §6,
BASELINE.md): same hyperparameters, per-epoch sampled VAL eval, best-on-val
checkpoint selection, final TEST block — logging in the reference ``.out``
format so runs diff cleanly against `/root/reference/*.out`.

Without the real Amazon JSONL (not shipped), runs use a synthetic
Amazon-class graph at the reference scale (58,867 users / 261,728 items /
~450K edges, zipf item popularity), which validates schedule, throughput,
and learning dynamics — quality parity numbers require the real dataset via
--jsonl.

    python scripts/reference_regression.py --preset vanilla --epochs 400 \
        [--jsonl dataset/Clothing.jsonl] [--out runs/vanilla.out]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="vanilla")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--jsonl", default=None,
                    help="real dataset JSONL; synthetic ref-scale otherwise")
    ap.add_argument("--cred", default=None, help="credibility CSV")
    ap.add_argument("--scale", default="ref",
                    choices=["small", "ref", "large"])
    ap.add_argument("--out", default=None, help="also tee log to this file")
    ap.add_argument("--metrics-jsonl", default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.configs.presets import get_preset
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        BipartiteGraph, build_bipartite_graph, synthetic_bipartite_graph)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import RecTrainer

    cfg = get_preset(args.preset).with_overrides(args.overrides)
    if args.epochs:
        cfg = cfg.replace(epochs=args.epochs)
    if args.cred:
        cfg = cfg.replace(cred_csv_path=args.cred)

    if args.jsonl:
        from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data.ingest import ingest_jsonl
        graph = build_bipartite_graph(ingest_jsonl(args.jsonl))
    elif args.scale == "ref":
        graph = synthetic_bipartite_graph(58_867, 261_728, 7.9, seed=0,
                                          power=1.0)
    elif args.scale == "large":
        # north-star class: ~10M interactions (BASELINE.json config 5)
        graph = synthetic_bipartite_graph(500_000, 1_000_000, 20.0, seed=0,
                                          power=1.0)
    else:
        graph = synthetic_bipartite_graph(2_000, 3_000, 16.0, seed=0,
                                          power=0.9)

    tee = open(args.out, "w") if args.out else None

    class Tee:
        def write(self, s):
            sys.__stdout__.write(s)
            if tee:
                tee.write(s)
                tee.flush()
        def flush(self):
            sys.__stdout__.flush()

    sys.stdout = Tee()

    print(f"Loaded edges. {graph.summary()}")
    import jax
    print("Using device:", jax.devices()[0])

    trainer = RecTrainer(cfg, graph)
    E = graph.train_edges.shape[1]
    nb = -(-trainer.train_users.size // cfg.batch_size)
    edges_per_epoch = E * cfg.num_layers * 2 * 2 * nb

    t0 = time.time()
    result = trainer.fit()
    wall = time.time() - t0

    print(f"\n[REGRESSION] preset={cfg.name} epochs={cfg.epochs} "
          f"wall={wall:.1f}s epochs/hour={cfg.epochs / wall * 3600:.1f} "
          f"propagation_edges_per_sec={edges_per_epoch * cfg.epochs / wall:,.0f}")

    if args.metrics_jsonl:
        with open(args.metrics_jsonl, "w") as f:
            for h in result.history:
                f.write(json.dumps({
                    "epoch": h.epoch, "loss": h.loss, "seconds": h.seconds,
                    "val": {str(k): v for k, v in (h.val or {}).items()},
                }, default=float) + "\n")
            f.write(json.dumps({
                "test": {str(k): v for k, v in result.test_metrics.items()},
                "best_val_recall": result.best_val_recall,
                "wall_seconds": wall,
            }, default=float) + "\n")


if __name__ == "__main__":
    main()
