"""per_batch vs per_epoch propagation at the scaled_10m config (VERDICT 5;
protocol refreshed round 4 per VERDICT r4 task 7).

Same graph, same seed, both schedules; quality + wall-clock recorded to
runs/schedule_compare.json for runs/SUMMARY.md.  per_batch recomputes the
K-layer propagation in every step (reference-faithful,
/root/reference/lightgcn.py:584); per_epoch caches the neighbor term across
an epoch (fast mode, live ego term keeps BPR gradients).

Round-4 protocol: the comparison runs EXACTLY what the scaled_10m preset
runs — full-catalog eval every epoch with the round-3 fast eval
(eval_topk=approx, eval_score_dtype=bf16) — on the PLANTED-structure
10M-edge benchmark graph (500K users / 1M items), so the quality side is
measured on a moving metric surface.  The round-2 run used sampled eval
every 5 epochs on the flat zipf graph; its 3.8x wall ratio is superseded
by this file's numbers.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import numpy as np
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.configs.presets import get_preset
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import (
        RecTrainer)

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    print("building planted 10M-edge graph...", flush=True)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        synthetic_bipartite_graph_planted)
    graph = synthetic_bipartite_graph_planted(
        500_000, 1_000_000, 20.0, seed=0, power=1.0,
        coarse_clusters=16, fine_per_coarse=16, mix=(0.55, 0.25, 0.20))
    print(graph.summary(), flush=True)

    out = {"protocol": "scaled_10m preset defaults: full-catalog eval "
                       "every epoch, eval_topk=approx, "
                       "eval_score_dtype=bf16, planted 10M graph"}
    for schedule in ("per_epoch", "per_batch"):
        cfg = get_preset("scaled_10m", propagation_schedule=schedule,
                         epochs=epochs, seed=0)
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
