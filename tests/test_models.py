"""LightGCN propagation variants vs dense numpy oracles; losses vs formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.operators import (
    cred_eq322_edge_maps, message_edge_maps, symmetric_norm_edge_map)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models import losses
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models.lightgcn import (
    LightGCN, init_params, xavier_uniform)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import RecConfig


@pytest.fixture(scope="module")
def cred(small_graph):
    return np.random.default_rng(11).uniform(0, 1, small_graph.num_users).astype(np.float32)


def _dense(em):
    return em.to_dense()


def test_xavier_limit():
    w = xavier_uniform(jax.random.PRNGKey(0), (1000, 64))
    limit = np.sqrt(6.0 / (1000 + 64))
    assert float(jnp.abs(w).max()) <= limit + 1e-6
    assert float(jnp.abs(w).max()) > limit * 0.95


def test_symmetric_propagation_matches_dense(small_graph):
    cfg = RecConfig(propagation="symmetric", weight_mode="symmetric",
                    num_layers=3, emb_dim=16)
    model = LightGCN(cfg, small_graph)
    params = init_params(jax.random.PRNGKey(0), cfg, small_graph.num_users,
                         small_graph.num_items)
    u_emb, i_emb = model.propagate(params)

    A = _dense(symmetric_norm_edge_map(small_graph))
    x = np.asarray(params["emb"], np.float64)
    xs = [x]
    for _ in range(3):
        xs.append(A @ xs[-1])
    final = np.mean(xs, axis=0)
    U = small_graph.num_users
    np.testing.assert_allclose(np.asarray(u_emb), final[:U], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(i_emb), final[U:], rtol=1e-4, atol=1e-5)


def test_bipartite_sync_matches_reference_order(small_graph, cred):
    """Jacobi semantics: user update consumes the PREVIOUS item layer
    (lightgcn_cu.py:429-439)."""
    cfg = RecConfig(propagation="bipartite_sync", weight_mode="cred_eq322",
                    table_layout="split", num_layers=3, emb_dim=8)
    model = LightGCN(cfg, small_graph, cred)
    params = init_params(jax.random.PRNGKey(1), cfg, small_graph.num_users,
                         small_graph.num_items)
    u_emb, i_emb = model.propagate(params)

    M_iu, M_ui = cred_eq322_edge_maps(small_graph, cred)  # item<-user, user<-item
    A_iu, A_ui = _dense(M_iu), _dense(M_ui)
    u = np.asarray(params["user_emb"], np.float64)
    i = np.asarray(params["item_emb"], np.float64)
    us, is_ = [u], [i]
    for _ in range(3):
        new_i = A_iu @ us[-1]
        new_u = A_ui @ is_[-1]
        us.append(new_u)
        is_.append(new_i)
    np.testing.assert_allclose(np.asarray(u_emb), np.mean(us, 0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(i_emb), np.mean(is_, 0), rtol=1e-4, atol=1e-5)


def test_gauss_seidel_matches_reference_order(small_graph, cred):
    """Gauss-Seidel semantics: user update consumes the FRESH item layer
    (version_1/lightgcn_cu_message.py:421-423)."""
    cfg = RecConfig(propagation="gauss_seidel", weight_mode="cu_message",
                    table_layout="split", num_layers=2, emb_dim=8)
    model = LightGCN(cfg, small_graph, cred)
    params = init_params(jax.random.PRNGKey(2), cfg, small_graph.num_users,
                         small_graph.num_items)
    u_emb, i_emb = model.propagate(params)

    M_iu, M_ui = message_edge_maps(small_graph, cred)
    A_iu, A_ui = _dense(M_iu), _dense(M_ui)
    u = np.asarray(params["user_emb"], np.float64)
    i = np.asarray(params["item_emb"], np.float64)
    us, is_ = [u], [i]
    for _ in range(2):
        i = A_iu @ u
        u = A_ui @ i
        us.append(u)
        is_.append(i)
    np.testing.assert_allclose(np.asarray(u_emb), np.mean(us, 0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(i_emb), np.mean(is_, 0), rtol=1e-4, atol=1e-5)


def test_sync_vs_gauss_seidel_differ(small_graph, cred):
    """The two orders are semantically different models (SURVEY.md §7)."""
    base = dict(weight_mode="cu_message", table_layout="split",
                num_layers=3, emb_dim=8)
    p = init_params(jax.random.PRNGKey(3),
                    RecConfig(propagation="gauss_seidel", **base),
                    small_graph.num_users, small_graph.num_items)
    m1 = LightGCN(RecConfig(propagation="bipartite_sync", **base), small_graph, cred)
    m2 = LightGCN(RecConfig(propagation="gauss_seidel", **base), small_graph, cred)
    u1, _ = m1.propagate(p)
    u2, _ = m2.propagate(p)
    assert not np.allclose(np.asarray(u1), np.asarray(u2), atol=1e-5)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def test_bpr_matches_formula(rng):
    pos = jnp.asarray(rng.normal(size=32).astype(np.float32))
    neg = jnp.asarray(rng.normal(size=32).astype(np.float32))
    got = float(losses.bpr_loss(pos, neg))
    expect = float(np.mean(-np.log(1 / (1 + np.exp(-(np.asarray(pos) - np.asarray(neg)))) + 1e-12)))
    assert abs(got - expect) < 1e-5


def test_bpr_mask_equals_variable_batch(rng):
    pos = jnp.asarray(rng.normal(size=32).astype(np.float32))
    neg = jnp.asarray(rng.normal(size=32).astype(np.float32))
    mask = jnp.asarray(np.arange(32) < 20)
    got = float(losses.bpr_loss(pos, neg, mask))
    expect = float(losses.bpr_loss(pos[:20], neg[:20]))
    assert abs(got - expect) < 1e-6


def test_ego_l2_matches_reference(rng):
    u = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    n = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    got = float(losses.ego_l2(u, p, n))
    expect = float(np.mean((np.asarray(u) ** 2).sum(1) + (np.asarray(p) ** 2).sum(1)
                           + (np.asarray(n) ** 2).sum(1)))
    assert abs(got - expect) < 1e-5


def test_fairness_loss(rng):
    pop = jnp.asarray(rng.uniform(0, 1, 16).astype(np.float32))
    s = jnp.asarray(rng.normal(size=16).astype(np.float32))
    got = float(losses.fairness_loss(pop, s))
    assert abs(got - float(np.mean(np.asarray(pop) * np.asarray(s)))) < 1e-6


def test_info_nce_identity_lower_than_shuffled(rng):
    z = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    aligned = float(losses.info_nce(z, z))
    shuffled = float(losses.info_nce(z, z[::-1]))
    assert aligned < shuffled


def test_masked_bce():
    pred = jnp.asarray([0.9, 0.1, 0.5])
    lab = jnp.asarray([1.0, 0.0, 1.0])
    m = jnp.asarray([True, True, False])
    got = float(losses.masked_bce(pred, lab, m))
    expect = float(np.mean([-np.log(0.9), -np.log(0.9)]))
    assert abs(got - expect) < 1e-5
    assert float(losses.masked_bce(pred, lab, jnp.zeros(3, bool))) == 0.0


# ---------------------------------------------------------------------------
# Round-2: padded-chain propagation + batch-row combine
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("propagation,weight_mode,layout", [
    ("symmetric", "symmetric", "joint"),
    ("bipartite_sync", "cred_eq322", "split"),
    ("gauss_seidel", "cu_message", "split"),
])
def test_pallas_padded_chain_propagate_matches_xla(small_graph, cred,
                                                   propagation, weight_mode,
                                                   layout):
    """The single-chip pallas padded chain (no per-layer truncation) must
    reproduce the xla-backend propagate for every variant."""
    cfg = RecConfig(propagation=propagation, weight_mode=weight_mode,
                    table_layout=layout, num_layers=2, emb_dim=16)
    params = init_params(jax.random.PRNGKey(0), cfg, small_graph.num_users,
                         small_graph.num_items)
    m_x = LightGCN(cfg, small_graph, cred, backend="xla")
    m_p = LightGCN(cfg, small_graph, cred, backend="pallas")
    assert m_p._padded_chain() is not None  # chain path engaged

    ux, ix = m_x.propagate(params)
    up, ip = m_p.propagate(params)
    np.testing.assert_allclose(np.asarray(up), np.asarray(ux),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ip), np.asarray(ix),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("propagation,weight_mode,layout,backend", [
    ("symmetric", "symmetric", "joint", "xla"),
    ("bipartite_sync", "cred_eq322", "split", "xla"),
    ("gauss_seidel", "cu_message", "split", "xla"),
    ("gauss_seidel", "cu_message", "split", "pallas"),
])
def test_propagate_rows_matches_table_gather(small_graph, cred, propagation,
                                             weight_mode, layout, backend):
    """Row-gather commutes with the layer mean: propagate_rows(users, items)
    must equal propagate()-then-gather bit-for-bit (same fp op order), and
    its gradients must match too."""
    cfg = RecConfig(propagation=propagation, weight_mode=weight_mode,
                    table_layout=layout, num_layers=2, emb_dim=16)
    params = init_params(jax.random.PRNGKey(0), cfg, small_graph.num_users,
                         small_graph.num_items)
    model = LightGCN(cfg, small_graph, cred, backend=backend)
    rng = np.random.default_rng(3)
    users = jnp.asarray(rng.integers(0, small_graph.num_users, 17), jnp.int32)
    items = jnp.asarray(rng.integers(0, small_graph.num_items, 17), jnp.int32)

    ue, ie = model.propagate(params)
    ur, ir = model.propagate_rows(params, users, items)
    np.testing.assert_array_equal(np.asarray(ur), np.asarray(ue[users]))
    np.testing.assert_array_equal(np.asarray(ir), np.asarray(ie[items]))

    def loss_tables(p):
        ue, ie = model.propagate(p)
        return jnp.sum(ue[users] * ie[items])

    def loss_rows(p):
        ur, ir = model.propagate_rows(p, users, items)
        return jnp.sum(ur * ir)

    g1 = jax.grad(loss_tables)(params)
    g2 = jax.grad(loss_rows)(params)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   rtol=1e-4, atol=1e-5)
