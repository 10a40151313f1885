"""Metric formulas vs a direct reimplementation of the reference's
``metrics_at_k`` (lightgcn.py:378-394)."""

import math

import jax.numpy as jnp
import numpy as np

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.eval import metrics as M


def _reference_metrics_at_k(ranked_items, gt_set, K):
    topk = ranked_items[:K]
    hits = [1 if x in gt_set else 0 for x in topk]
    hit_count = sum(hits)
    precision = hit_count / K
    recall = hit_count / max(len(gt_set), 1)
    dcg = sum(1.0 / math.log2(idx + 2) for idx, h in enumerate(hits) if h)
    ideal_hits = min(len(gt_set), K)
    idcg = sum(1.0 / math.log2(i + 2) for i in range(ideal_hits))
    ndcg = (dcg / idcg) if idcg > 0 else 0.0
    return precision, recall, ndcg


def test_topk_metrics_match_reference(rng):
    B, Kmax, I = 16, 20, 50
    for trial in range(5):
        ranked = np.stack([rng.permutation(I)[:Kmax] for _ in range(B)])
        gt_sets = [set(rng.choice(I, size=rng.integers(1, 8), replace=False).tolist())
                   for _ in range(B)]
        hits = np.stack([[1 if ranked[b, k] in gt_sets[b] else 0
                          for k in range(Kmax)] for b in range(B)])
        gt_len = np.array([len(s) for s in gt_sets])
        out = M.topk_metrics(jnp.asarray(hits), jnp.asarray(gt_len), (10, 20))
        for K in (10, 20):
            for b in range(B):
                p, r, n = _reference_metrics_at_k(ranked[b], gt_sets[b], K)
                assert abs(float(out[K]["precision"][b]) - p) < 1e-4
                assert abs(float(out[K]["recall"][b]) - r) < 1e-4
                assert abs(float(out[K]["ndcg"][b]) - n) < 1e-4


def test_sampled_rank_metrics_match_reference(rng):
    """The sampled protocol ranks 1 pos + 99 negs; with gt={pos} the metrics
    are functions of the positive's rank only."""
    for trial in range(10):
        scores = rng.normal(size=100)
        pos_item, items = 0, np.arange(100)
        ranked = items[np.argsort(-scores, kind="stable")]
        rank = int(np.sum(scores[1:] > scores[0]))
        out = M.sampled_rank_metrics(jnp.asarray([rank]), (10, 20))
        for K in (10, 20):
            p, r, n = _reference_metrics_at_k(ranked, {pos_item}, K)
            assert abs(float(out[K]["precision"][0]) - p) < 1e-5
            assert abs(float(out[K]["recall"][0]) - r) < 1e-5
            assert abs(float(out[K]["ndcg"][0]) - n) < 1e-5


def test_novelty_stats_match_reference(rng):
    """Version-2/lighgcn_cu_pop.py:390-404 semantics."""
    pop = rng.integers(0, 100, 30).astype(np.int64)
    total = int(pop.sum())
    topk = rng.integers(0, 30, (4, 10))
    lp, si = M.novelty_stats(jnp.asarray(topk), jnp.asarray(pop), total, 30)
    for b in range(4):
        pops = pop[topk[b]]
        exp_lp = float(np.log(pops + 1.0).mean())
        p = (pops + 1.0) / (total + 30)
        exp_si = float((-np.log2(p)).mean())
        assert abs(float(lp[b]) - exp_lp) < 1e-4
        assert abs(float(si[b]) - exp_si) < 1e-4


def test_cred_groups_match_reference(rng):
    users = rng.permutation(100)[:50].astype(np.int64)
    cred = rng.uniform(0, 1, 100)
    high, low = M.cred_groups(users, cred, 0.2)
    k = max(int(round(50 * 0.2)), 1)
    assert len(high) == len(low) == k
    assert set(high) == set(users[np.argsort(cred[users])[-k:]])
    assert set(low) == set(users[np.argsort(cred[users])[:k]])


def test_item_popularity():
    edges = np.array([[0, 1, 2, 3], [1, 1, 2, 0]])
    pop, total = M.item_popularity(edges, 4)
    np.testing.assert_array_equal(pop, [1, 2, 1, 0])
    assert total == 4
