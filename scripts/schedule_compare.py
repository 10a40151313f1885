"""per_batch vs per_epoch propagation at the scaled_10m config (VERDICT 5).

Same graph, same seed, ~50 epochs each; quality + wall-clock recorded to
runs/schedule_compare.json for runs/SUMMARY.md.  per_batch recomputes the
K-layer propagation in every step (reference-faithful,
/root/reference/lightgcn.py:584); per_epoch caches the neighbor term across
an epoch (fast mode, live ego term keeps BPR gradients).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import numpy as np
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.configs.presets import get_preset
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        synthetic_bipartite_graph)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import (
        RecTrainer)

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print("building 10M-edge graph...", flush=True)
    graph = synthetic_bipartite_graph(500_000, 1_000_000, 20.0, seed=0,
                                      power=1.0)
    print(graph.summary(), flush=True)

    out = {}
    for schedule in ("per_epoch", "per_batch"):
        cfg = get_preset("scaled_10m", propagation_schedule=schedule,
                         eval_mode="sampled", eval_every=5, epochs=epochs,
                         seed=0)
        t0 = time.time()
        tr = RecTrainer(cfg, graph, verbose=True)
        fit = tr.fit()
        dt = time.time() - t0
        out[schedule] = {
            "epochs": epochs,
            "seconds": dt,
            "epoch_seconds_median": float(np.median(
                [e.seconds for e in fit.history[1:]])),
            "best_val_recall20": float(fit.best_val_recall),
            "test": {int(K): {m: float(v) for m, v in r.items()
                              if isinstance(v, (int, float))}
                     for K, r in fit.test_metrics.items()},
        }
        print(f"[{schedule}] {dt:.0f}s "
              f"testR@20={out[schedule]['test'][20]['recall']:.4f}",
              flush=True)
        Path("runs/schedule_compare.json").write_text(json.dumps(out, indent=2))
    print("done")


if __name__ == "__main__":
    main()
