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
