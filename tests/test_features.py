"""Feature engineering vs brute-force dict oracles (reference semantics)."""

import math
from collections import defaultdict

import numpy as np
import pytest

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data import features as F
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data.ingest import InteractionTable
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import CredConfig


def _mk_table(rng, U=25, I=15, N=400, with_tokens=True):
    uidx = rng.integers(0, U, N).astype(np.int32)
    iidx = rng.integers(0, I, N).astype(np.int32)
    rating = rng.uniform(1.0, 5.0, N).astype(np.float32)
    ts = np.where(rng.random(N) < 0.9,
                  (1.5e12 + rng.integers(0, 200, N) * 86400_000
                   + rng.integers(0, 86400_000, N)),
                  -1).astype(np.int64)
    helpful = np.where(rng.random(N) < 0.8, rng.integers(0, 15, N),
                       np.nan).astype(np.float32)
    tok = rng.integers(0, 30, N).astype(np.int32)
    uniq = np.minimum(tok, rng.integers(0, 30, N)).astype(np.int32)
    return InteractionTable(
        user_ids=[f"u{k}" for k in range(U)], item_ids=[f"i{k}" for k in range(I)],
        user2idx={f"u{k}": k for k in range(U)},
        item2idx={f"i{k}": k for k in range(I)},
        uidx=uidx, iidx=iidx, rating=rating, timestamp=ts,
        helpful_vote=helpful, verified=rng.integers(0, 2, N).astype(np.float32),
        split=np.zeros(N, np.int8), positive=rating >= 4.0,
        tok_count=tok if with_tokens else np.zeros(N, np.int32),
        uniq_tok_count=uniq if with_tokens else np.zeros(N, np.int32),
    )


@pytest.fixture(scope="module")
def table():
    return _mk_table(np.random.default_rng(42))


def test_labels_match_reference_rule(table):
    lab = F.build_user_labels(table)
    U = table.num_users
    tot = defaultdict(int)
    hel = defaultdict(int)
    for k in range(table.num_records):
        u = int(table.uidx[k])
        tot[u] += 1
        hv = table.helpful_vote[k]
        if not np.isnan(hv) and hv > 5:
            hel[u] += 1
    for u in range(U):
        Ru = hel[u] / tot[u] if tot[u] else 0.0
        assert abs(float(lab.Ru[u]) - Ru) < 1e-6
        expect = 1 if Ru >= 0.7 else (0 if Ru <= 0.3 else -1)
        assert lab.label[u] == expect


def _oracle_v0(table, cfg):
    """Direct reimplementation of main.py:247-373 with dicts."""
    U = table.num_users
    user_n = defaultdict(int)
    user_r = defaultdict(lambda: [0] * 5)
    user_extreme = defaultdict(int)
    user_ttr = defaultdict(float)
    user_buckets = defaultdict(lambda: defaultdict(int))
    item_sum = defaultdict(float)
    item_cnt = defaultdict(int)
    glen_sum = 0.0
    glen_cnt = 0
    for k in range(table.num_records):
        u, i = int(table.uidx[k]), int(table.iidx[k])
        ri = int(round(float(table.rating[k])))
        ri = min(max(ri, 1), 5)
        user_n[u] += 1
        user_r[u][ri - 1] += 1
        if ri in (1, 5):
            user_extreme[u] += 1
        item_sum[i] += ri
        item_cnt[i] += 1
        L = int(table.tok_count[k])
        glen_sum += L
        glen_cnt += 1
        if L > 0:
            user_ttr[u] += int(table.uniq_tok_count[k]) / L
        ts = int(table.timestamp[k])
        if ts >= 0:
            user_buckets[u][ts // cfg.tau_ms] += 1
    gavg = glen_sum / max(glen_cnt, 1)
    item_mean = {i: item_sum[i] / item_cnt[i] for i in item_cnt}
    aad = defaultdict(float)
    rd = defaultdict(float)
    for k in range(table.num_records):
        u, i = int(table.uidx[k]), int(table.iidx[k])
        ri = min(max(int(round(float(table.rating[k]))), 1), 5)
        aad[u] += abs(ri - item_mean[i])
        rd[u] += abs(int(table.tok_count[k]) - gavg)
    out = {}
    for u in range(U):
        n = user_n[u]
        counts = user_r[u]
        tot = sum(counts)
        H = -sum((c / tot) * math.log(c / tot) for c in counts if c > 0) if tot else 0.0
        BC = sum(c - 1 for c in user_buckets[u].values() if c > 1)
        out[u] = dict(
            rating_entropy=H,
            extremity_ratio=user_extreme[u] / n if n else 0.0,
            average_rating_deviation=aad[u] / n if n else 0.0,
            review_burst_count=float(BC),
            lexical_diversity=user_ttr[u] / n if n else 0.0,
            review_length_discrepancy=rd[u] / n if n else 0.0,
        )
    return out


def test_v0_features_match_oracle(table):
    cfg = CredConfig(feature_set="v0")
    feats = F.compute_user_features(table, cfg)
    oracle = _oracle_v0(table, cfg)
    for u in range(table.num_users):
        for k, key in enumerate(feats.keys):
            if key == "Ru":
                continue
            got = float(feats.values[u, k])
            exp = oracle[u][key]
            assert abs(got - exp) < 1e-4, (u, key, got, exp)


def test_v1_features_shapes_and_ranges(table):
    cfg = CredConfig(feature_set="v1")
    t = table
    t.extra["user_unique_tokens"] = np.random.default_rng(0).integers(
        0, 50, t.num_users).astype(np.int64)
    feats = F.compute_user_features(t, cfg)
    assert feats.keys == F.V1_FEATURE_KEYS
    assert feats.values.shape == (t.num_users, 9)
    rnr = feats.values[:, feats.keys.index("RNR")]
    assert (rnr >= 0).all() and (rnr <= 1).all()
    etg = feats.values[:, feats.keys.index("ETG")]
    assert (etg >= 0).all()
    assert np.isfinite(feats.values).all()


def test_v1_etg_manual():
    """ETG oracle: user with 4 reviews at day gaps [1, 1, 30]."""
    day = 86400_000
    ts = np.array([0, day, 2 * day, 32 * day], np.int64) + int(1.6e12)
    N = 4
    t = InteractionTable(
        user_ids=["u0"], item_ids=["i0"], user2idx={"u0": 0},
        item2idx={"i0": 0},
        uidx=np.zeros(N, np.int32), iidx=np.zeros(N, np.int32),
        rating=np.full(N, 5.0, np.float32), timestamp=ts,
        helpful_vote=np.zeros(N, np.float32), verified=np.zeros(N, np.float32),
        split=np.zeros(N, np.int8), positive=np.ones(N, bool),
        tok_count=np.ones(N, np.int32), uniq_tok_count=np.ones(N, np.int32),
    )
    t.extra["user_unique_tokens"] = np.array([1], np.int64)
    feats = F.compute_user_features(t, CredConfig(feature_set="v1"))
    # gaps = [1, 1, 30] -> counts {1: 2, 30: 1} -> H = -(2/3 ln 2/3 + 1/3 ln 1/3)
    expect = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    got = feats.values[0, feats.keys.index("ETG")]
    assert abs(float(got) - expect) < 1e-5


def test_v1_requires_token_union(table):
    t = _mk_table(np.random.default_rng(1))
    with pytest.raises(ValueError, match="corpus-level"):
        F.compute_user_features(t, CredConfig(feature_set="v1"))


def test_ingest_collect_token_hashes(tmp_path):
    import json
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data.ingest import ingest_jsonl
    p = tmp_path / "d.jsonl"
    recs = [
        {"user_id": "a", "parent_asin": "x", "rating": 5.0, "text": "cat dog"},
        {"user_id": "a", "parent_asin": "y", "rating": 5.0, "text": "cat bird"},
        {"user_id": "b", "parent_asin": "x", "rating": 5.0, "text": "cat cat"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    t = ingest_jsonl(p, collect_token_hashes=True)
    # user a corpus = {cat, dog, bird} = 3; user b = {cat} = 1
    np.testing.assert_array_equal(t.extra["user_unique_tokens"], [3, 1])
