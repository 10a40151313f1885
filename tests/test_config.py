"""Config system: overrides, coercion, serialization, preset table."""

import pytest

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.configs.presets import PRESETS, get_preset
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (
    CredConfig, IngestConfig, RecConfig)


def test_override_coercion_types():
    cfg = RecConfig().with_overrides([
        "epochs=7", "lr=0.01", "extended_metrics=true", "Ks=5,25",
        "name=x", "cred_csv_path=/tmp/c.csv"])
    assert cfg.epochs == 7 and isinstance(cfg.epochs, int)
    assert cfg.lr == 0.01 and isinstance(cfg.lr, float)
    assert cfg.extended_metrics is True
    assert cfg.Ks == (5, 25)
    assert cfg.name == "x"
    assert cfg.cred_csv_path == "/tmp/c.csv"


def test_override_unknown_key():
    with pytest.raises(ValueError, match="Unknown config key"):
        RecConfig().with_overrides(["nope=1"])
    with pytest.raises(ValueError, match="key=value"):
        RecConfig().with_overrides(["no_equals"])


def test_dict_roundtrip():
    cfg = RecConfig(epochs=3, Ks=(1, 2))
    d = cfg.to_dict()
    cfg2 = RecConfig.from_dict({**d, "Ks": tuple(d["Ks"])})
    assert cfg2.epochs == 3
    with pytest.raises(ValueError, match="Unknown config keys"):
        RecConfig.from_dict({"bogus": 1})


def test_presets_validate():
    for name, cfg in PRESETS.items():
        cfg.validate()
    assert get_preset("vanilla").propagation == "symmetric"
    assert get_preset("pop_neg").negative_sampler == "popmix"
    assert get_preset("cred_eq322").lambda_fair == 0.0
    assert get_preset("cred_eq322_fair").lambda_fair == pytest.approx(1e-2)
    assert get_preset("vanilla", epochs=5).epochs == 5
    with pytest.raises(KeyError):
        get_preset("nope")


def test_validate_rejects_bad_combo():
    with pytest.raises(AssertionError):
        RecConfig(propagation="symmetric", weight_mode="cu_message").validate()


def test_cred_ingest_defaults():
    c = CredConfig()
    assert c.helpful_vote_threshold == 5
    assert c.tau_ms == 86400_000
    i = IngestConfig()
    assert i.pos_rating_threshold == 4.0
    assert (i.train_p, i.val_p, i.test_p) == (0.80, 0.10, 0.10)


def test_lazy_top_level_exports():
    import beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu as bb
    assert bb.RecConfig().emb_dim == 64
    assert bb.get_preset("pop_neg").negative_sampler == "popmix"
    assert callable(bb.ingest_jsonl)
    assert callable(bb.RecTrainer)
    import pytest as _pytest
    with _pytest.raises(AttributeError):
        bb.nonexistent_symbol


def test_throughput_counters():
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.profiling import Throughput
    t = Throughput(edges_per_step=1000)
    t.start()
    t.stop(steps=5)
    assert t.steps == 5
    assert t.edges_per_sec > 0
    assert "steps" in t.summary()


def test_from_json_roundtrip(tmp_path):
    cfg = RecConfig(epochs=7, Ks=(3, 9), name="x")
    p = tmp_path / "c.json"
    p.write_text(cfg.to_json())
    cfg2 = RecConfig.from_json(p)
    assert cfg2.epochs == 7 and cfg2.Ks == (3, 9) and cfg2.name == "x"


def test_metrics_block_matches_reference_format():
    """The human log format must diff cleanly against the reference .out
    files (lightgcn.py:608-611 prints '  K=10: P=0.0155 R=0.3099 ...')."""
    import re
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import (
        format_metrics_block)
    res = {10: {"precision": 0.0155, "recall": 0.3099, "ndcg": 0.1862,
                "mode": "sampled(1pos+neg)"},
           20: {"precision": 0.01, "recall": 0.2, "ndcg": 0.1,
                "mode": "sampled(1pos+neg)"}}
    block = format_metrics_block("VAL", res).splitlines()
    assert block[0] == "VAL metrics:"
    assert block[1] == "  K=10: P=0.0155 R=0.3099 NDCG=0.1862 (sampled(1pos+neg))"
    assert re.match(r"  K=20: P=\d\.\d{4} R=\d\.\d{4} NDCG=\d\.\d{4} \(.*\)",
                    block[2])
