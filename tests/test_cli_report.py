"""CLI subcommands end-to-end + reporting utilities."""

import json

import numpy as np
import pytest

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.cli.main import main as cli_main


def _write_demo_jsonl(path, n=600, seed=0):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for _ in range(n):
            f.write(json.dumps({
                "user_id": f"u{int(rng.integers(0, 40))}",
                "parent_asin": f"i{int(rng.integers(0, 30))}",
                "rating": float(rng.integers(1, 6)),
                "timestamp": int(1.5e12 + rng.integers(0, 3e10)),
                "helpful_vote": int(rng.integers(0, 12)),
                "verified_purchase": bool(rng.integers(0, 2)),
                "title": "x", "text": "some words here",
            }) + "\n")


def test_cli_full_pipeline(tmp_path, capsys):
    jsonl = tmp_path / "r.jsonl"
    _write_demo_jsonl(jsonl)

    cli_main(["build-graph", "--jsonl", str(jsonl), "--out", str(tmp_path)])
    assert (tmp_path / "graph.npz").exists()

    cli_main(["train-cred", "--jsonl", str(jsonl), "--out", str(tmp_path),
              "epochs=3", "batch_size=32"])
    assert (tmp_path / "credibility_scores_minmax_with_user_id.csv").exists()
    assert (tmp_path / "graph_hetero.npz").exists()

    out2 = tmp_path / "rec"
    cli_main(["train-rec", "--graph", str(tmp_path / "graph.npz"),
              "--preset", "cu_message",
              "--cred", str(tmp_path / "credibility_scores_minmax_with_user_id.csv"),
              "--out", str(out2),
              "epochs=2", "batch_size=64", "sampled_negatives=20"])
    assert (out2 / "best_model.npz").exists()
    assert (out2 / "test_metrics.json").exists()

    cli_main(["evaluate", "--graph", str(tmp_path / "graph.npz"),
              "--params", str(out2 / "best_model.npz"),
              "--preset", "cu_message", "--split", "val",
              "sampled_negatives=20", "batch_size=64"])
    out = capsys.readouterr().out
    assert "VAL metrics:" in out


def test_cli_bad_override(tmp_path):
    jsonl = tmp_path / "r.jsonl"
    _write_demo_jsonl(jsonl, n=50)
    with pytest.raises(ValueError, match="Unknown config key"):
        cli_main(["build-graph", "--jsonl", str(jsonl), "--out",
                  str(tmp_path), "bogus_key=1"])


def test_plot_feature_distributions(tmp_path):
    pytest.importorskip("matplotlib")
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data.features import (
        compute_user_features)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data.ingest import ingest_jsonl
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.eval.report import (
        plot_feature_distributions)
    jsonl = tmp_path / "r.jsonl"
    _write_demo_jsonl(jsonl, n=300)
    feats = compute_user_features(ingest_jsonl(jsonl))
    paths = plot_feature_distributions(feats, tmp_path / "plots")
    assert len(paths) == len(feats.keys)
    import os
    assert all(os.path.getsize(p) > 0 for p in paths)


def test_metric_logger(tmp_path):
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.eval.report import MetricLogger
    log = MetricLogger(tmp_path / "m.jsonl", echo=False)
    log.log({"epoch": 1, "loss": 0.5})
    log.log({"epoch": 2, "loss": 0.4})
    log.close()
    lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert lines[1]["loss"] == 0.4


def test_cli_train_cred_artifacts_and_merge(tmp_path):
    import numpy as np
    jsonl = tmp_path / "r.jsonl"
    _write_demo_jsonl(jsonl, n=400, seed=3)
    cli_main(["train-cred", "--jsonl", str(jsonl), "--out", str(tmp_path),
              "epochs=2", "batch_size=32"])
    # reference intermediate artifacts
    assert (tmp_path / "user_labels.csv").exists()
    assert (tmp_path / "user_features.csv").exists()
    import csv
    rows = list(csv.DictReader(open(tmp_path / "user_labels.csv")))
    assert {"user_id", "total_reviews", "helpful_reviews", "Ru",
            "label"} <= set(rows[0].keys())

    cli_main(["build-graph", "--jsonl", str(jsonl), "--out", str(tmp_path)])
    cli_main(["merge-user-ids",
              "--npy", str(tmp_path / "credibility_scores_minmax.npy"),
              "--graph", str(tmp_path / "graph.npz"),
              "--out", str(tmp_path / "merged.csv")])
    assert (tmp_path / "merged.csv").exists()


def test_cli_train_cred_resume(tmp_path, capsys):
    """VERDICT r4 task 6: train-cred --checkpoint/--resume/--mesh reach the
    CredTrainer capabilities from the product CLI."""
    jsonl = tmp_path / "r.jsonl"
    _write_demo_jsonl(jsonl, n=400, seed=3)
    cli_main(["train-cred", "--jsonl", str(jsonl), "--out", str(tmp_path),
              "--checkpoint", "--mesh", "8",
              "epochs=2", "batch_size=32"])
    assert (tmp_path / "cred_ckpt").exists()
    capsys.readouterr()
    # resume continues past the checkpointed epoch instead of restarting
    cli_main(["train-cred", "--jsonl", str(jsonl), "--out", str(tmp_path),
              "--checkpoint", "--resume", "--mesh", "8",
              "epochs=4", "batch_size=32"])
    out = capsys.readouterr().out
    assert "resumed at epoch 3" in out
    assert "Epoch 01" not in out
    assert (tmp_path / "credibility_scores_minmax_with_user_id.csv").exists()
