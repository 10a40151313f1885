"""Data ingestion: tolerant JSONL reader, md5 split, interning parity."""

import hashlib
import json

import numpy as np
import pytest

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data import ingest as ing
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import IngestConfig


def _write_jsonl(path, records, bad_lines=()):
    lines = [json.dumps(r) for r in records]
    for pos, junk in bad_lines:
        lines.insert(pos, junk)
    path.write_text("\n".join(lines) + "\n")


def _mk_record(u, i, rating, ts=1000, helpful=0, verified=False, text="hello world"):
    return {"user_id": u, "parent_asin": i, "rating": rating, "timestamp": ts,
            "helpful_vote": helpful, "verified_purchase": verified,
            "title": "t", "text": text}


def test_reader_skips_bad_lines(tmp_path):
    p = tmp_path / "d.jsonl"
    recs = [_mk_record(f"u{k}", f"i{k}", 5.0) for k in range(5)]
    _write_jsonl(p, recs, bad_lines=[(2, "{not json"), (4, "")])
    got = list(ing.iter_jsonl_records(p))
    assert len(got) == 5
    # line numbers account for the skipped lines
    assert got[0][0] == 1


def test_reader_tolerates_bad_utf8(tmp_path):
    p = tmp_path / "d.jsonl"
    good = json.dumps(_mk_record("u0", "i0", 5.0)).encode()
    bad = b'{"user_id": "u\xff1", "parent_asin": "i1", "rating": 4.5}'
    p.write_bytes(good + b"\n" + bad + b"\n")
    got = list(ing.iter_jsonl_records(p))
    assert len(got) == 2  # lossy decode keeps the line parseable


def test_md5_split_exact_algorithm():
    """The split must be byte-for-byte the reference algorithm
    (lightgcn.py:86-95): md5(f"{uid}|{iid}")[:8] as fraction of 0xFFFFFFFF."""
    for uid, iid in [("A", "B"), ("user1", "item9"), ("ü", "日")]:
        h = hashlib.md5(f"{uid}|{iid}".encode("utf-8")).hexdigest()
        x = int(h[:8], 16) / 0xFFFFFFFF
        expect = 0 if x < 0.8 else (1 if x < 0.9 else 2)
        assert ing.md5_split_bucket(uid, iid) == expect


def test_md5_split_proportions():
    buckets = [ing.md5_split_bucket(f"u{k}", f"i{k % 97}") for k in range(5000)]
    frac = np.bincount(buckets, minlength=3) / 5000
    assert abs(frac[0] - 0.8) < 0.03
    assert abs(frac[1] - 0.1) < 0.02
    assert abs(frac[2] - 0.1) < 0.02


def test_ingest_interning_and_columns(tmp_path):
    p = tmp_path / "d.jsonl"
    recs = [
        _mk_record("ua", "i1", 5.0, ts=10, helpful=7, verified=True),
        _mk_record("ub", "i1", 2.0, ts=20),
        _mk_record("ua", "i2", 4.0, ts=30, text="the the cat"),
        {"user_id": None, "parent_asin": "ix", "rating": 5.0},   # dropped
        {"user_id": "uc", "parent_asin": "i3", "rating": "bad"},  # dropped
    ]
    _write_jsonl(p, recs)
    t = ing.ingest_jsonl(p, IngestConfig(jsonl_path=str(p), backend="python"))

    assert t.num_users == 2 and t.num_items == 2
    assert t.user_ids == ["ua", "ub"]           # encounter order
    assert t.item_ids == ["i1", "i2"]
    np.testing.assert_array_equal(t.uidx, [0, 1, 0])
    np.testing.assert_array_equal(t.iidx, [0, 0, 1])
    np.testing.assert_allclose(t.rating, [5.0, 2.0, 4.0])
    np.testing.assert_array_equal(t.positive, [True, False, True])
    assert t.verified[0] == 1.0 and t.verified[1] == 0.0
    assert t.helpful_vote[0] == 7.0
    # "the the cat" -> 3 tokens, 2 unique
    assert t.tok_count[2] == 4 and t.uniq_tok_count[2] == 3  # includes title "t"


def test_positive_edges_and_split(tmp_path):
    p = tmp_path / "d.jsonl"
    recs = [_mk_record(f"u{k % 11}", f"i{k % 7}", 4.0 + (k % 2)) for k in range(60)]
    _write_jsonl(p, recs)
    t = ing.ingest_jsonl(p, IngestConfig(jsonl_path=str(p), backend="python"))
    edges = t.positive_edges()
    assert edges.shape[0] == 2
    assert edges.shape[1] == int(t.positive.sum())
    # split buckets match the hash of raw ids
    for k in range(t.num_records):
        expect = ing.md5_split_bucket(t.user_ids[t.uidx[k]], t.item_ids[t.iidx[k]])
        assert t.split[k] == expect


def test_alternate_item_key_asin(tmp_path):
    """graph.py / index.ipynb use item_key='asin' instead of parent_asin
    (SURVEY.md: graph.py:196,261) — the config covers that variant."""
    p = tmp_path / "d.jsonl"
    recs = [{"user_id": f"u{k%5}", "asin": f"a{k%3}", "rating": 5.0}
            for k in range(20)]
    _write_jsonl(p, recs)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import IngestConfig
    t = ing.ingest_jsonl(p, IngestConfig(item_key="asin", backend="python"))
    assert t.num_records == 20 and t.num_items == 3
    t2 = ing.ingest_jsonl(p, IngestConfig(item_key="asin", backend="native"))
    assert t2.num_records == 20 and t2.item_ids == t.item_ids
