"""Edge-sharded SpMM over the virtual 8-device mesh vs single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.operators import (
    EdgeMap, symmetric_norm_edge_map)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.spmm import SpmmOperator
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.mesh import make_mesh
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.sharded_spmm import (
    ShardedSpmmOperator)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, shape=(1, 8))


def _random_edge_map(rng, num_src, num_dst, E):
    return EdgeMap(
        src=rng.integers(0, num_src, E).astype(np.int32),
        dst=rng.integers(0, num_dst, E).astype(np.int32),
        w=rng.normal(size=E).astype(np.float32),
        num_src=num_src, num_dst=num_dst)


def test_sharded_matches_dense(mesh, rng):
    em = _random_edge_map(rng, num_src=67, num_dst=93, E=700)
    op = ShardedSpmmOperator(em, mesh)
    x = jnp.asarray(rng.normal(size=(em.num_src, 16)).astype(np.float32))
    y = op(x)
    expect = em.to_dense() @ np.asarray(x, np.float64)
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-4, atol=1e-4)


def test_sharded_matches_single_device_operator(mesh, small_graph, rng):
    em = symmetric_norm_edge_map(small_graph)
    op_single = SpmmOperator(em, backend="xla")
    op_sharded = ShardedSpmmOperator(em, mesh)
    x = jnp.asarray(rng.normal(size=(em.num_src, 8)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(op_sharded(x)),
                               np.asarray(op_single(x)),
                               rtol=1e-4, atol=1e-5)


def test_sharded_backward_is_transpose(mesh, rng):
    em = _random_edge_map(rng, num_src=50, num_dst=40, E=300)
    op = ShardedSpmmOperator(em, mesh)
    x = jnp.asarray(rng.normal(size=(em.num_src, 8)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(em.num_dst, 8)).astype(np.float32))
    dx = jax.grad(lambda x: jnp.sum(op(x) * cot))(x)
    expect = em.to_dense().T @ np.asarray(cot, np.float64)
    np.testing.assert_allclose(np.asarray(dx), expect, rtol=1e-4, atol=1e-4)


def test_sharded_under_jit(mesh, rng):
    em = _random_edge_map(rng, num_src=30, num_dst=30, E=200)
    op = ShardedSpmmOperator(em, mesh)
    x = jnp.asarray(rng.normal(size=(30, 8)).astype(np.float32))

    @jax.jit
    def f(x):
        return jnp.sum(op(x) ** 2)

    g = jax.jit(jax.grad(f))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_sharded_skewed_distribution(mesh, rng):
    """All edges land on one device's range — correctness under skew."""
    em = EdgeMap(src=rng.integers(0, 20, 100).astype(np.int32),
                 dst=np.zeros(100, np.int32),   # all to row 0
                 w=np.ones(100, np.float32), num_src=20, num_dst=64)
    op = ShardedSpmmOperator(em, mesh)
    x = jnp.asarray(rng.normal(size=(20, 8)).astype(np.float32))
    y = np.asarray(op(x))
    expect = em.to_dense() @ np.asarray(x, np.float64)
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(y[1:], 0.0)


def test_sharded_model_propagate_matches_single(mesh, small_graph, rng):
    """Full LightGCN propagate with mesh-sharded operators == single-chip."""
    import functools
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models.lightgcn import (
        LightGCN, init_params)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import RecConfig

    cred = rng.uniform(0.2, 1.0, small_graph.num_users).astype(np.float32)
    for prop, wm in (("gauss_seidel", "cu_message"),
                     ("bipartite_sync", "cred_eq322"),
                     ("symmetric", "symmetric")):
        cfg = RecConfig(propagation=prop, weight_mode=wm,
                        table_layout="split" if prop != "symmetric" else "joint",
                        emb_dim=8, num_layers=2)
        params = init_params(jax.random.PRNGKey(0), cfg,
                             small_graph.num_users, small_graph.num_items)
        m_single = LightGCN(cfg, small_graph, cred)
        m_sharded = LightGCN(
            cfg, small_graph, cred,
            operator_factory=functools.partial(ShardedSpmmOperator, mesh=mesh))
        u1, i1 = m_single.propagate(params)
        u2, i2 = m_sharded.propagate(params)
        np.testing.assert_allclose(np.asarray(u2), np.asarray(u1),
                                   rtol=1e-4, atol=1e-5, err_msg=prop)
        np.testing.assert_allclose(np.asarray(i2), np.asarray(i1),
                                   rtol=1e-4, atol=1e-5, err_msg=prop)


def test_allgather_mode_matches_dense(mesh, rng):
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.sharded_spmm import (
        ShardedSpmmOperator as Op)
    em = _random_edge_map(rng, num_src=67, num_dst=93, E=700)
    op = Op(em, mesh, mode="allgather")
    x = jnp.asarray(rng.normal(size=(em.num_src, 16)).astype(np.float32))
    expect = em.to_dense() @ np.asarray(x, np.float64)
    np.testing.assert_allclose(np.asarray(op(x)), expect, rtol=1e-4, atol=1e-4)
    dx = jax.grad(lambda x: jnp.sum(op(x) ** 2))(x)
    assert np.isfinite(np.asarray(dx)).all()


def test_balanced_spans_padding_waste_on_zipf(mesh):
    """VERDICT item 4: edge-count-balanced partitioning keeps per-device
    edge padding waste under 20% on a zipf(1.0) power-law graph."""
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        synthetic_bipartite_graph)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.operators import (
        message_edge_maps)
    g = synthetic_bipartite_graph(num_users=2000, num_items=6000,
                                  edges_per_user=10.0, seed=3, power=1.0)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.sharded_spmm import (
        ShardedSpmmOperator as Op)
    ifu, ufi = message_edge_maps(g, np.ones(g.num_users, np.float32))
    for em in (ifu, ufi):
        op = Op(em, mesh)
        assert op.pad_fraction < 0.20, (em.num_dst, op.pad_fraction)


def test_span_layout_roundtrip_and_grad(mesh, rng):
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.sharded_spmm import (
        SpanLayout, balanced_spans)
    N, D = 137, 8
    weights = rng.integers(0, 50, N)
    layout = SpanLayout(balanced_spans(weights, 8), mesh)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    p = layout.to_padded(x)
    assert p.shape == (layout.padded_rows, D)
    np.testing.assert_allclose(np.asarray(layout.from_padded(p)),
                               np.asarray(x), rtol=1e-6)
    # VJPs are the dual gathers (no scatters): check against identity
    g = jax.grad(lambda x: jnp.sum(layout.to_padded(x) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x), rtol=1e-5)
    gp = jax.grad(lambda p: jnp.sum(layout.from_padded(p) ** 2))(p)
    np.testing.assert_allclose(np.asarray(gp), 2 * np.asarray(p) *
                               np.asarray(layout.mask), rtol=1e-5)


def test_halo_volume_below_allgather(mesh, rng):
    """The halo exchange ships fewer row-slots than replicating the table
    when sources are reused sparsely across devices."""
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.sharded_spmm import (
        ShardedSpmmOperator as Op)
    em = _random_edge_map(rng, num_src=4000, num_dst=4000, E=8000)
    halo = Op(em, mesh, mode="halo")
    ag = Op(em, mesh, mode="allgather")
    assert halo.collective_rows < ag.collective_rows


def test_auto_mode_records_true_halo_h_max(mesh, rng):
    """In mode="auto" the stats must carry the CONSIDERED halo plan's
    h_max even for directions where allgather won — the built allgather
    plan's own h_max field is a placeholder 1, and scaling analyses
    (scripts/scaling_projection.py) need the real alternative volume."""
    em = _random_edge_map(rng, num_src=67, num_dst=93, E=700)
    auto = ShardedSpmmOperator(em, mesh, mode="auto")
    halo = ShardedSpmmOperator(em, mesh, mode="halo")
    for d in ("fwd", "bwd"):
        assert auto.stats[d]["halo_h_max_considered"] == \
            halo.stats[d]["h_max"]
        assert halo.stats[d]["halo_h_max_considered"] == \
            halo.stats[d]["h_max"]
    # dense source on 8 devices: every span needs ~all 67 source rows, so
    # P*P*h_max >> (P-1)*padded_rows and auto must pick allgather — the
    # placeholder-vs-considered distinction is actually exercised.
    assert auto.stats["fwd_mode"] == "allgather"
    assert auto.stats["fwd"]["h_max"] == 1
    assert auto.stats["fwd"]["halo_h_max_considered"] > 1
