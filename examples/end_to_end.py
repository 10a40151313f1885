"""End-to-end demo: raw JSONL -> ingest -> features/labels -> graph ->
credibility CSV contract -> Stage-B training -> extended evaluation.

Runs on CPU in ~2 minutes:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/end_to_end.py
"""
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.configs.presets import get_preset
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data.cred_io import save_credibility_csv
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data.features import (
    build_user_labels, compute_user_features)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data.ingest import ingest_jsonl
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import build_bipartite_graph
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import RecTrainer


def make_demo_jsonl(path: Path, n: int = 4000, seed: int = 0):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for _ in range(n):
            u, i = int(rng.integers(0, 120)), int(rng.zipf(1.4)) % 90
            f.write(json.dumps({
                "user_id": f"u{u}", "parent_asin": f"i{i}",
                "rating": float(rng.integers(1, 6)),
                "timestamp": int(1.5e12 + rng.integers(0, 3e10)),
                "helpful_vote": int(rng.integers(0, 12)),
                "verified_purchase": bool(rng.integers(0, 2)),
                "title": "great product",
                "text": "really liked the fit and color",
            }) + "\n")
        f.write("{broken json line\n")  # the reader must survive this


def main():
    tmp = Path(tempfile.mkdtemp(prefix="bb_demo_"))
    jsonl = tmp / "reviews.jsonl"
    make_demo_jsonl(jsonl)

    table = ingest_jsonl(jsonl)
    print(f"[e2e] ingested: {table.num_records} records, "
          f"{table.num_users} users, {table.num_items} items")

    labels = build_user_labels(table)
    feats = compute_user_features(table)
    print(f"[e2e] labels: genuine={int((labels.label == 1).sum())} "
          f"fake={int((labels.label == 0).sum())} "
          f"unlabeled={int((labels.label == -1).sum())}")
    print(f"[e2e] features: {feats.values.shape} keys={feats.keys}")

    graph = build_bipartite_graph(table)
    print(f"[e2e] graph: {graph.summary()}")

    # Stage A: train the credibility model and export the CSV contract.
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.hetero import (
        build_heterograph)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.cred_trainer import (
        CredTrainer)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (
        CredConfig)
    hg = build_heterograph(table, feats)
    cred_trainer = CredTrainer(hg, CredConfig(epochs=10, batch_size=64),
                               verbose=False)
    cred_res = cred_trainer.fit()
    paths = cred_trainer.export(cred_res, tmp)
    cred_csv = paths["csv"]
    print(f"[e2e] stage-A cred scores: p50="
          f"{float(np.median(cred_res.cred_minmax)):.4f}")

    cfg = get_preset("pop_extended").replace(
        batch_size=128, epochs=8, sampled_negatives=30, Ks=(5, 10),
        cred_csv_path=str(cred_csv))
    trainer = RecTrainer(cfg, graph)
    res = trainer.fit()
    print(f"[e2e] best val recall@10 = {res.best_val_recall:.4f}")
    print(f"[e2e] test coverage@10 = {res.test_metrics[10]['item_coverage']:.4f}")


if __name__ == "__main__":
    main()
