"""Two-stage pipeline at the NORTH-STAR scale (VERDICT r4 item 3).

Round-4 gap: Stage B had 10M-edge runs but Stage A had only been
trained/measured at ~600K edges, and the reference's SLAS machinery
(/root/reference/main.py:758-883) is exactly the piece whose cost explodes
with graph size.  This script closes it on the real chip:

  Phase A — the planted 10M-edge bipartite interactions (the same
    generator the scaled_10m benchmarks use) become a heterograph via
    ``synthetic_heterograph_from_edges`` (type-conditional labels /
    features / edge attrs); ``CredTrainer`` runs in the DEFAULT ``slas``
    mode (Gumbel-top-k sampled neighborhoods, candidate pool capped by
    ``slas_pad_deg`` — required at this scale, see
    ops/slas.py:SlasSampler.build) and records s/epoch, peak HBM, holdout
    AUC; scores are min-max exported to the CSV contract.

  Phase B — ``RecTrainer`` under the scaled_10m preset AS SHIPPED (fp32
    messages per the round-5 A/B, per_epoch cached propagation,
    approx/bf16 full-catalog eval) consumes that CSV on the SAME planted
    split graph — the end-to-end two-stage story at 10M scale (was 600K,
    runs/two_stage_r2/).

Usage (TPU, one job at a time):
  python scripts/two_stage_10m.py --out runs/two_stage_10m \
      [--cred-epochs 6] [--rec-epochs 12] [--pad-deg 128]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def log(msg):
    print(msg, flush=True)


def peak_hbm_gb():
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats.get("peak_bytes_in_use", 0) / 1e9, 3)
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/two_stage_10m")
    ap.add_argument("--users", type=int, default=500_000)
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--edges-per-user", type=float, default=20.0)
    ap.add_argument("--cred-epochs", type=int, default=6)
    ap.add_argument("--rec-epochs", type=int, default=12)
    ap.add_argument("--pad-deg", type=int, default=128,
                    help="SLAS candidate-pool cap (max-degree tables are "
                         "memory-infeasible at this scale)")
    ap.add_argument("--skip-a", action="store_true",
                    help="reuse an existing Phase-A CSV in --out")
    ap.add_argument("--skip-b", action="store_true")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    summary = {}

    import jax
    log(f"[10m] device: {jax.devices()[0]}")

    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        synthetic_bipartite_graph_planted)

    t0 = time.time()
    graph = synthetic_bipartite_graph_planted(
        args.users, args.items, args.edges_per_user, seed=0, power=1.0,
        coarse_clusters=16, fine_per_coarse=16, mix=(0.55, 0.25, 0.20))
    log(f"[10m] planted graph: {graph.summary()} "
        f"({time.time()-t0:.0f}s)")
    csv_path = out / "credibility_scores_minmax_with_user_id.csv"

    if not args.skip_a:
        from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.hetero import (
            synthetic_heterograph_from_edges)
        from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.cred_trainer import (
            CredTrainer)
        from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (
            CredConfig)

        t0 = time.time()
        edges = np.concatenate(
            [graph.train_edges, graph.val_edges, graph.test_edges], axis=1)
        hg = synthetic_heterograph_from_edges(
            edges, graph.num_users, graph.num_items, seed=1)
        log(f"[10m] heterograph: U={hg.num_users:,} I={hg.num_items:,} "
            f"E={hg.num_edges:,} labeled={(hg.user_y >= 0).sum():,} "
            f"({time.time()-t0:.0f}s)")

        ccfg = CredConfig(epochs=args.cred_epochs,
                          slas_pad_deg=args.pad_deg)
        t0 = time.time()
        tr = CredTrainer(hg, ccfg)        # default slas mode
        t_build = time.time() - t0
        log(f"[10m] stage A setup (slas tables, pad={args.pad_deg}): "
            f"{t_build:.1f}s, peak HBM {peak_hbm_gb()} GB")

        t0 = time.time()
        res = tr.fit()
        wall_a = time.time() - t0
        epoch_secs = [h["seconds"] for h in res.history]
        log(f"[10m] stage A: {args.cred_epochs} epochs in {wall_a:.1f}s "
            f"(median {np.median(epoch_secs):.2f} s/epoch), "
            f"peak HBM {peak_hbm_gb()} GB")
        paths = tr.export(res, out)
        q = np.percentile(res.cred_minmax, [10, 50, 90])
        summary["stage_a"] = {
            "edges": int(hg.num_edges),
            "labeled_users": int((hg.user_y >= 0).sum()),
            "trainer_mode": ccfg.trainer_mode,
            "slas_pad_deg": args.pad_deg,
            "setup_seconds": round(t_build, 1),
            "epochs": args.cred_epochs,
            "wall_seconds": round(wall_a, 1),
            "seconds_per_epoch_median": round(float(np.median(epoch_secs)), 3),
            "seconds_per_epoch": [round(s, 3) for s in epoch_secs],
            "holdout_auc_final": res.history[-1]["holdout_auc"],
            "holdout_bce_final": res.history[-1]["holdout_bce"],
            "peak_hbm_gb": peak_hbm_gb(),
            "cred_percentiles_p10_p50_p90": [round(float(x), 4) for x in q],
            "csv": paths["csv"],
        }
        (out / "summary.json").write_text(json.dumps(summary, indent=2))
        # free Phase-A device state before Stage B
        del tr, res, hg
        import gc
        gc.collect()

    if not args.skip_b:
        from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.configs.presets import (
            get_preset)
        from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import (
            RecTrainer)

        cfg = get_preset("scaled_10m", epochs=args.rec_epochs, seed=0,
                         cred_csv_path=str(csv_path))
        t0 = time.time()
        rtr = RecTrainer(cfg, graph)
        log(f"[10m] stage B setup: {time.time()-t0:.1f}s")
        t0 = time.time()
        fit = rtr.fit()
        wall_b = time.time() - t0
        test = {str(K): {k: float(v)
                         for k, v in fit.test_metrics[K].items()
                         if isinstance(v, (int, float))}
                for K in fit.test_metrics}
        log(f"[10m] stage B: {args.rec_epochs} epochs in {wall_b:.1f}s, "
            f"TEST R@20={test['20']['recall']:.4f} "
            f"NDCG@20={test['20']['ndcg']:.4f}, peak HBM {peak_hbm_gb()} GB")
        summary.setdefault("stage_a", {"csv": str(csv_path),
                                       "note": "reused (--skip-a)"})
        summary["stage_b"] = {
            "preset": "scaled_10m (as shipped: fp32 messages, per_epoch, "
                      "approx/bf16 full eval)",
            "epochs": args.rec_epochs,
            "wall_seconds": round(wall_b, 1),
            "best_val_recall": float(fit.best_val_recall),
            "test": test,
            "peak_hbm_gb": peak_hbm_gb(),
        }
        (out / "summary.json").write_text(json.dumps(summary, indent=2))

    log(f"[10m] DONE -> {out}/summary.json")


if __name__ == "__main__":
    main()
