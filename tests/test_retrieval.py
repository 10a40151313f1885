"""Retrieval API: single-chip and mesh paths agree; exclusions honored."""

import jax.numpy as jnp
import numpy as np
import pytest

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.eval.retrieval import (
    build_exclusion_rows, topk_for_users)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.mesh import make_mesh


def test_topk_basic_and_exclusion(small_graph, rng):
    U, I, D = small_graph.num_users, small_graph.num_items, 8
    user_emb = jnp.asarray(rng.normal(size=(U, D)).astype(np.float32))
    item_emb = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
    excl = jnp.asarray(build_exclusion_rows(small_graph, "train"))
    users = jnp.arange(20, dtype=jnp.int32)

    scores, ids = topk_for_users(user_emb, item_emb, users, 10,
                                 exclude_rows=excl)
    tr = small_graph.user_csr("train")
    for b, u in enumerate(np.asarray(users)):
        seen = set(tr.row(int(u)).tolist())
        assert not (set(np.asarray(ids[b]).tolist()) & seen)
        assert np.all(np.diff(np.asarray(scores[b])) <= 1e-6)


def test_topk_mesh_matches_single(small_graph, rng):
    mesh = make_mesh(8, shape=(1, 8))
    U, I, D = small_graph.num_users, small_graph.num_items, 8
    user_emb = jnp.asarray(rng.normal(size=(U, D)).astype(np.float32))
    item_emb = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
    excl = jnp.asarray(build_exclusion_rows(small_graph, "train"))
    users = jnp.arange(16, dtype=jnp.int32)

    s1, i1 = topk_for_users(user_emb, item_emb, users, 5, exclude_rows=excl)
    s2, i2 = topk_for_users(user_emb, item_emb, users, 5, exclude_rows=excl,
                            mesh=mesh)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    for b in range(16):
        assert set(np.asarray(i1[b]).tolist()) == set(np.asarray(i2[b]).tolist())


def test_exclusion_rows_for_users_matches_global_table(small_graph, rng):
    """Per-batch (B, Pb) rows carry the same item sets as the gathered
    global (U, Pmax) table (padding width differs; contents must not)."""
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.eval.retrieval import (
        exclusion_rows_for_users)
    table = build_exclusion_rows(small_graph, "train")
    users = rng.integers(0, small_graph.num_users, 33)
    batch = exclusion_rows_for_users(small_graph, users)
    # power-of-two width, bounded by the batch's own max degree
    assert batch.shape[1] & (batch.shape[1] - 1) == 0
    pad = small_graph.num_items
    for b, u in enumerate(users):
        assert (set(batch[b].tolist()) - {pad}
                == set(table[int(u)].tolist()) - {pad})


def test_topk_exclude_batch_rows_equals_table(small_graph, rng):
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.eval.retrieval import (
        exclusion_rows_for_users)
    U, I, D = small_graph.num_users, small_graph.num_items, 8
    user_emb = jnp.asarray(rng.normal(size=(U, D)).astype(np.float32))
    item_emb = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
    users = jnp.arange(20, dtype=jnp.int32)
    excl_t = jnp.asarray(build_exclusion_rows(small_graph, "train"))
    excl_b = jnp.asarray(exclusion_rows_for_users(small_graph,
                                                  np.arange(20)))
    s1, i1 = topk_for_users(user_emb, item_emb, users, 10,
                            exclude_rows=excl_t)
    s2, i2 = topk_for_users(user_emb, item_emb, users, 10,
                            exclude_batch_rows=excl_b)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_fast_hash_split_proportions():
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        synthetic_bipartite_graph)
    g = synthetic_bipartite_graph(2000, 1500, 10.0, seed=1, hash_split="fast")
    tot = sum(g.edges(s).shape[1] for s in ("train", "val", "test"))
    assert abs(g.train_edges.shape[1] / tot - 0.8) < 0.02
    assert abs(g.val_edges.shape[1] / tot - 0.1) < 0.02


def test_full_eval_approx_topk_matches_exact_on_cpu(small_graph):
    """eval_topk="approx" (lax.approx_max_k, the TPU PartialReduce top-k)
    must produce the same full-catalog metrics as "exact" on CPU, where
    the op lowers to an exact fallback — guards the plumbing; the TPU
    recall/metric delta is measured in runs/ (scripts/probe_topk.py)."""
    import jax
    import jax.numpy as jnp
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.eval.ranking import (
        EvalContext, evaluate_full)

    ctx = EvalContext.build(small_graph)
    rng = np.random.default_rng(0)
    ue = jnp.asarray(rng.normal(size=(small_graph.num_users, 16)) * 0.2,
                     jnp.float32)
    ie = jnp.asarray(rng.normal(size=(small_graph.num_items, 16)) * 0.2,
                     jnp.float32)
    exact = evaluate_full(ue, ie, ctx, "test", Ks=(5, 10), topk="exact")
    approx = evaluate_full(ue, ie, ctx, "test", Ks=(5, 10), topk="approx")
    for K in (5, 10):
        for m in ("precision", "recall", "ndcg"):
            assert abs(exact[K][m] - approx[K][m]) < 1e-9, (K, m)


def test_full_eval_batch_invariance(small_graph):
    """Full-catalog metrics must not depend on the eval batch size on the
    exact path (the last chunk is padded + masked).  Also covers the
    clamp: batch=4096 on a 120-user graph must not allocate a (4096, I)
    score matrix.  NOTE this CPU test cannot certify the TPU approx path
    at large batches — XLA approx_top_k silently degrades there
    (RecConfig.eval_batch docstring; evaluate_full warns)."""
    import jax.numpy as jnp
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.eval.ranking import (
        EvalContext, evaluate_full)

    ctx = EvalContext.build(small_graph)
    rng = np.random.default_rng(1)
    ue = jnp.asarray(rng.normal(size=(small_graph.num_users, 16)) * 0.2,
                     jnp.float32)
    ie = jnp.asarray(rng.normal(size=(small_graph.num_items, 16)) * 0.2,
                     jnp.float32)
    ref = evaluate_full(ue, ie, ctx, "test", Ks=(5, 10), batch=8)
    for B in (32, 64, 4096):
        got = evaluate_full(ue, ie, ctx, "test", Ks=(5, 10), batch=B)
        for K in (5, 10):
            for m in ("precision", "recall", "ndcg"):
                # 1e-6: float32 per-batch sums accumulate in a
                # different order per batch size
                assert abs(ref[K][m] - got[K][m]) < 1e-6, (B, K, m)
