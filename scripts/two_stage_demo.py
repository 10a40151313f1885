"""Full two-stage pipeline at reference scale: raw JSONL -> Stage A
(credibility training + CSV export) -> Stage B (cred-weighted LightGCN).

Mirrors the reference's end-to-end flow (main.py then lightgcn_cu.py) on a
synthetic Amazon-class review stream, exercising: native C++ ingest,
feature engineering, heterograph build, full-graph CredModel training,
the CSV contract, and cred-weighted Stage-B training with real scores
(the reference's `lightgcn_cu_fair.out` configuration).

    python scripts/two_stage_demo.py [--lines 600000] [--rec-epochs 400]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def make_synthetic_reviews(path: Path, n_lines: int, n_users: int,
                           n_items: int, seed: int = 0):
    """Amazon-class review stream: zipf item popularity, power-ish user
    activity, rating skew toward 4-5, bursty timestamps for some users."""
    rng = np.random.default_rng(seed)
    t0 = time.time()
    # user activity ~ lognormal, item popularity ~ zipf
    user_w = rng.lognormal(0.0, 1.2, n_users)
    user_p = user_w / user_w.sum()
    item_w = 1.0 / np.arange(1, n_items + 1) ** 1.05
    item_p = item_w / item_w.sum()
    users = rng.choice(n_users, size=n_lines, p=user_p)
    items = rng.choice(n_items, size=n_lines, p=item_p)
    ratings = rng.choice([1.0, 2.0, 3.0, 4.0, 5.0], size=n_lines,
                         p=[0.06, 0.06, 0.13, 0.25, 0.50])
    ts = (1.45e12 + rng.integers(0, int(1.5e11), n_lines)).astype(np.int64)
    helpful = rng.choice([0, 1, 2, 3, 8, 15], size=n_lines,
                         p=[0.55, 0.2, 0.1, 0.05, 0.06, 0.04])
    verified = rng.random(n_lines) < 0.75
    texts = ["great fit and color really nice quality",
             "did not like it returned the item",
             "good value for the price would buy again",
             "terrible don't buy this product it broke"]
    with open(path, "w") as f:
        for k in range(n_lines):
            f.write(json.dumps({
                "user_id": f"U{users[k]:07d}",
                "parent_asin": f"B{items[k]:08d}",
                "rating": float(ratings[k]),
                "timestamp": int(ts[k]),
                "helpful_vote": int(helpful[k]),
                "verified_purchase": bool(verified[k]),
                "title": "review",
                "text": texts[k % 4],
            }) + "\n")
    print(f"[demo] wrote {n_lines:,} lines in {time.time()-t0:.1f}s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lines", type=int, default=600_000)
    ap.add_argument("--users", type=int, default=60_000)
    ap.add_argument("--items", type=int, default=250_000)
    ap.add_argument("--cred-epochs", type=int, default=60)
    ap.add_argument("--rec-epochs", type=int, default=400)
    ap.add_argument("--out", default="runs/two_stage")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    jsonl = out / "reviews.jsonl"
    if not jsonl.exists():
        make_synthetic_reviews(jsonl, args.lines, args.users, args.items)

    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.configs.presets import get_preset
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data.features import (
        compute_user_features)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data.ingest import ingest_jsonl
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        build_bipartite_graph)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.hetero import (
        build_heterograph)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.cred_trainer import (
        CredTrainer)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import RecTrainer
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import CredConfig

    t0 = time.time()
    table = ingest_jsonl(jsonl)
    print(f"[demo] ingest ({table.extra.get('backend', 'python')}): "
          f"{table.num_records:,} records, {table.num_users:,} users, "
          f"{table.num_items:,} items in {time.time()-t0:.1f}s")

    feats = compute_user_features(table)
    hg = build_heterograph(table, feats)
    lab = feats.labels.label
    print(f"[demo] labels: genuine={(lab == 1).sum():,} "
          f"fake={(lab == 0).sum():,} unlabeled={(lab == -1).sum():,}")

    ccfg = CredConfig(epochs=args.cred_epochs)
    cred_tr = CredTrainer(hg, ccfg)
    t0 = time.time()
    cred_res = cred_tr.fit()
    print(f"[demo] stage A: {args.cred_epochs} epochs in "
          f"{time.time()-t0:.1f}s")
    paths = cred_tr.export(cred_res, out)

    graph = build_bipartite_graph(table)
    print(f"[demo] stage B graph: {graph.summary()}")

    cfg = get_preset("cred_eq322").replace(
        epochs=args.rec_epochs, cred_csv_path=paths["csv"])
    rec_tr = RecTrainer(cfg, graph)
    t0 = time.time()
    result = rec_tr.fit()
    wall = time.time() - t0
    print(f"\n[demo] stage B: {args.rec_epochs} epochs in {wall:.1f}s "
          f"({args.rec_epochs / wall * 3600:.0f} epochs/hour)")
    with open(out / "summary.json", "w") as f:
        json.dump({
            "test": {str(k): v for k, v in result.test_metrics.items()},
            "best_val_recall": result.best_val_recall,
            "stage_b_wall_seconds": wall,
        }, f, indent=2, default=float)


if __name__ == "__main__":
    main()
