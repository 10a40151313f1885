"""Native C++ ingest vs the pure-Python oracle: byte-for-byte parity."""

import json

import numpy as np
import pytest

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data import ingest as ing
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import IngestConfig

native = pytest.importorskip(
    "beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data.native.ingest_native")


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load_library()
    except ImportError:
        pytest.skip("g++ unavailable")


def _write_demo(path, rng, n=800):
    with open(path, "wb") as f:
        for k in range(n):
            rec = {
                "user_id": f"user_{int(rng.integers(0, 60))}",
                "parent_asin": f"B{int(rng.integers(0, 45)):07d}",
                "rating": float(rng.integers(1, 6)),
                "timestamp": int(1.5e12 + rng.integers(0, 3e10)),
                "helpful_vote": int(rng.integers(0, 12)),
                "verified_purchase": bool(rng.integers(0, 2)),
                "title": "Great product! it's nice",
                "text": "The FIT and coölor are great don't you think "
                        * int(rng.integers(1, 3)),
                "images": [{"url": "http://x", "sizes": [1, 2]}],
            }
            if k % 50 == 0:
                rec.pop("rating")          # invalid record, has user
            if k % 71 == 0:
                rec.pop("user_id")         # invalid record, no user
            f.write(json.dumps(rec).encode() + b"\n")
        f.write(b"{broken\n")
        f.write(b'{"user_id": "u\xffx", "parent_asin": "A1", "rating": 5.0}\n')


def test_md5_split_parity(lib):
    for uid, iid in [("A", "B"), ("user_1", "B0000001"), ("x" * 30, "y"),
                     ("ü", "日")]:
        assert native.split_bucket_native(uid, iid) == \
            ing.md5_split_bucket(uid, iid)


def test_native_matches_python(tmp_path, lib):
    p = tmp_path / "d.jsonl"
    _write_demo(p, np.random.default_rng(0))
    cfg_py = IngestConfig(jsonl_path=str(p), backend="python")
    cfg_nat = IngestConfig(jsonl_path=str(p), backend="native")
    t_py = ing.ingest_jsonl(p, cfg_py, collect_token_hashes=True)
    t_nat = ing.ingest_jsonl(p, cfg_nat, collect_token_hashes=True)
    assert t_nat.extra.get("backend") == "native"

    assert t_nat.num_records == t_py.num_records
    assert t_nat.user_ids == t_py.user_ids
    assert t_nat.item_ids == t_py.item_ids
    np.testing.assert_array_equal(t_nat.uidx, t_py.uidx)
    np.testing.assert_array_equal(t_nat.iidx, t_py.iidx)
    np.testing.assert_allclose(t_nat.rating, t_py.rating)
    np.testing.assert_array_equal(t_nat.timestamp, t_py.timestamp)
    np.testing.assert_allclose(t_nat.helpful, t_py.helpful_vote) \
        if hasattr(t_nat, "helpful") else \
        np.testing.assert_allclose(np.nan_to_num(t_nat.helpful_vote, nan=-1),
                                   np.nan_to_num(t_py.helpful_vote, nan=-1))
    np.testing.assert_array_equal(t_nat.verified, t_py.verified)
    np.testing.assert_array_equal(t_nat.split, t_py.split)
    np.testing.assert_array_equal(t_nat.positive, t_py.positive)
    np.testing.assert_array_equal(t_nat.tok_count, t_py.tok_count)
    np.testing.assert_array_equal(t_nat.uniq_tok_count, t_py.uniq_tok_count)
    # corpus-level unique token counts (different hash functions, same sets)
    np.testing.assert_array_equal(t_nat.extra["user_unique_tokens"],
                                  t_py.extra["user_unique_tokens"])
    # all-records label counters
    for u in t_py.user_ids:
        assert t_nat.extra["label_total"].get(u, 0) == \
            t_py.extra["label_total"].get(u, 0)
        assert t_nat.extra["label_helpful"].get(u, 0) == \
            t_py.extra["label_helpful"].get(u, 0)


def test_native_features_pipeline(tmp_path, lib):
    """Native table flows through the full feature pipeline unchanged."""
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data.features import (
        compute_user_features)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import CredConfig
    p = tmp_path / "d.jsonl"
    _write_demo(p, np.random.default_rng(1), n=300)
    t_py = ing.ingest_jsonl(p, IngestConfig(backend="python"),
                            collect_token_hashes=True)
    t_nat = ing.ingest_jsonl(p, IngestConfig(backend="native"),
                             collect_token_hashes=True)
    for fs in ("v0", "v1"):
        f_py = compute_user_features(t_py, CredConfig(feature_set=fs))
        f_nat = compute_user_features(t_nat, CredConfig(feature_set=fs))
        np.testing.assert_allclose(f_nat.values, f_py.values, rtol=1e-5,
                                   atol=1e-6)
