"""On-device samplers: membership search, positives, negatives, pop-mix."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.csr import edges_to_csr
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops import sampling as smp


@pytest.fixture(scope="module")
def csr_pair():
    rng = np.random.default_rng(3)
    edges = np.unique(np.stack([rng.integers(0, 40, 500),
                                rng.integers(0, 60, 500)], 1), axis=0).T
    host = edges_to_csr(edges[0], edges[1], 40)
    dev = smp.DeviceCSR.from_host(host, 60)
    return host, dev


def test_row_contains_matches_host(csr_pair):
    host, dev = csr_pair
    rng = np.random.default_rng(4)
    rows = rng.integers(0, 40, 64)
    cands = rng.integers(0, 60, (64, 7))
    got = np.asarray(smp.row_contains(dev, jnp.asarray(rows), jnp.asarray(cands)))
    for b in range(64):
        for k in range(7):
            assert got[b, k] == host.has(rows[b], cands[b, k])


def test_sample_positives_in_row(csr_pair):
    host, dev = csr_pair
    rows_all = np.nonzero(host.degrees() > 0)[0]
    rows = jnp.asarray(np.resize(rows_all, 128).astype(np.int64))
    pos = np.asarray(smp.sample_positives(jax.random.PRNGKey(0), dev, rows))
    for b, u in enumerate(np.asarray(rows)):
        assert host.has(int(u), int(pos[b]))


def test_sample_positives_covers_row(csr_pair):
    host, dev = csr_pair
    u = int(np.argmax(host.degrees()))
    rows = jnp.full((2000,), u, jnp.int32)
    pos = np.asarray(smp.sample_positives(jax.random.PRNGKey(1), dev, rows))
    assert set(pos.tolist()) == set(host.row(u).tolist())


def test_negatives_not_in_row(csr_pair):
    host, dev = csr_pair
    rows_all = np.nonzero(host.degrees() > 0)[0]
    rows = jnp.asarray(np.resize(rows_all, 512).astype(np.int64))
    neg = np.asarray(smp.sample_negatives_uniform(
        jax.random.PRNGKey(2), dev, rows, 60, rounds=8))
    bad = sum(host.has(int(u), int(neg[b])) for b, u in enumerate(np.asarray(rows)))
    assert bad == 0  # collision prob after 8 rounds ~ (deg/I)^9


def test_popmix_distribution():
    deg = np.array([100.0, 0.0, 0.0, 0.0])
    s = smp.PopMixSampler.build(deg, mix_pop=1.0, gamma=0.75)
    draws = np.asarray(s.draw(jax.random.PRNGKey(5), (20000,)))
    freq = np.bincount(draws, minlength=4) / 20000
    pop = (deg + 1.0) ** 0.75
    expect = pop / pop.sum()
    np.testing.assert_allclose(freq, expect, atol=0.02)


def test_alias_table_exact_reconstruction_1m_items():
    """VERDICT r3 item 6: at >=1M items the alias table must represent the
    target distribution EXACTLY (the float32 inverse-CDF it replaces loses
    tail items to ULP collisions near 1.0).  Reconstruction identity:
    p[i] = (accept[i] + sum_{j: alias[j]==i} (1-accept[j])) / n."""
    rng = np.random.default_rng(13)
    n = 1_000_000
    # zipf-like degrees: heavy head, long zero tail (the hard case for the
    # round-pairing construction: few larges absorb ~everything)
    deg = np.zeros(n)
    deg[:1000] = np.floor(1e5 / (1.0 + np.arange(1000)) ** 1.2)
    pop = (deg + 1.0) ** 0.75
    accept, alias = smp.build_alias_table(pop)
    prob = pop / pop.sum()
    recon = accept.copy()
    np.add.at(recon, alias, 1.0 - accept)
    recon /= n
    np.testing.assert_allclose(recon, prob, rtol=1e-9, atol=1e-15)


def test_alias_table_uniform_and_point_mass():
    # uniform: every accept == 1 (self-alias)
    accept, alias = smp.build_alias_table(np.ones(17))
    np.testing.assert_allclose(accept, 1.0)
    # extreme: half the mass on one bucket of 1e6 (single-large endgame)
    n = 1_000_000
    pop = np.ones(n)
    pop[42] = n - 1.0  # bucket 42 carries ~half the total mass
    accept, alias = smp.build_alias_table(pop)
    prob = pop / pop.sum()
    recon = accept.copy()
    np.add.at(recon, alias, 1.0 - accept)
    recon /= n
    np.testing.assert_allclose(recon, prob, rtol=1e-9, atol=1e-15)


def test_popmix_tail_samplable_at_1m_items():
    """Tail items (indices near I-1, where a float32 CDF saturates) must
    still be drawn at their expected rate."""
    n = 1_000_000
    deg = np.zeros(n)
    deg[:100] = 1e5
    s = smp.PopMixSampler.build(deg, mix_pop=1.0, gamma=0.75)
    m = 200_000
    draws = np.asarray(s.draw(jax.random.PRNGKey(17), (m,)))
    pop = (deg + 1.0) ** 0.75
    prob = pop / pop.sum()
    # last 10% of the catalog: expected mass under the pop distribution
    tail = draws >= n - n // 10
    expect = prob[n - n // 10:].sum()
    got = tail.mean()
    assert expect > 0.05  # the tail genuinely carries mass in this setup
    assert abs(got - expect) < 0.01, (got, expect)
    # and draws actually reach the very end of the catalog
    assert draws.max() > n - n // 100


def test_popmix_mixture_uniform_component():
    deg = np.zeros(10)
    s = smp.PopMixSampler.build(deg, mix_pop=0.0)
    draws = np.asarray(s.draw(jax.random.PRNGKey(6), (20000,)))
    freq = np.bincount(draws, minlength=10) / 20000
    np.testing.assert_allclose(freq, 0.1, atol=0.02)


def test_popmix_rejection(csr_pair):
    host, dev = csr_pair
    s = smp.PopMixSampler.build(np.ones(60) * 5, mix_pop=0.7)
    rows_all = np.nonzero(host.degrees() > 0)[0]
    rows = jnp.asarray(np.resize(rows_all, 256).astype(np.int64))
    neg = np.asarray(smp.sample_negatives_popmix(
        jax.random.PRNGKey(7), dev, rows, s, rounds=8))
    bad = sum(host.has(int(u), int(neg[b])) for b, u in enumerate(np.asarray(rows)))
    assert bad <= 1


def test_candidate_set_rejects_all_csrs(csr_pair):
    host, dev = csr_pair
    rng = np.random.default_rng(8)
    edges2 = np.unique(np.stack([rng.integers(0, 40, 200),
                                 rng.integers(0, 60, 200)], 1), axis=0).T
    host2 = edges_to_csr(edges2[0], edges2[1], 40)
    dev2 = smp.DeviceCSR.from_host(host2, 60)
    rows = jnp.asarray(np.arange(40, dtype=np.int64))
    cands = np.asarray(smp.sample_candidate_set(
        jax.random.PRNGKey(9), (dev, dev2), rows, 60, 9, rounds=10))
    bad = 0
    for b in range(40):
        for k in range(9):
            if host.has(b, int(cands[b, k])) or host2.has(b, int(cands[b, k])):
                bad += 1
    assert bad == 0


def test_gumbel_topk_respects_weights():
    logits = jnp.log(jnp.asarray([10.0, 1.0, 1.0, 1.0, 1.0]))
    counts = np.zeros(5)
    for t in range(500):
        idx, _ = smp.gumbel_topk(jax.random.PRNGKey(t), logits, 2)
        counts[np.asarray(idx)] += 1
    # heaviest item should appear in nearly every sample-without-replacement
    assert counts[0] > 450
    # remaining mass roughly uniform
    assert counts[1:].std() < counts[1:].mean() * 0.5


def test_gumbel_topk_mask():
    logits = jnp.zeros(6)
    mask = jnp.asarray([True, True, True, False, False, False])
    for t in range(20):
        idx, _ = smp.gumbel_topk(jax.random.PRNGKey(t), logits, 3, mask)
        assert set(np.asarray(idx).tolist()) == {0, 1, 2}


def test_hash_membership_matches_bsearch():
    """Hash-slab membership must be EXACT (bit-equal booleans to the
    binary-search path) so sampler outputs are identical either way."""
    rng = np.random.default_rng(11)
    for nrows, ncols, E in ((40, 60, 500), (1, 5, 3), (100, 1000, 1),
                            (64, 512, 4000)):
        edges = np.unique(np.stack([rng.integers(0, nrows, E),
                                    rng.integers(0, ncols, E)], 1), axis=0).T
        host = edges_to_csr(edges[0], edges[1], nrows)
        dev_h = smp.DeviceCSR.from_host(host, ncols, membership="hash")
        dev_b = smp.DeviceCSR.from_host(host, ncols, membership="bsearch")
        assert dev_h.hashmem is not None and dev_b.hashmem is None
        rows = jnp.asarray(rng.integers(0, nrows, 77))
        cands = jnp.asarray(rng.integers(0, ncols, (77, 9)))
        got_h = np.asarray(smp.row_contains(dev_h, rows, cands))
        got_b = np.asarray(smp.row_contains(dev_b, rows, cands))
        np.testing.assert_array_equal(got_h, got_b)


def test_hash_membership_empty():
    host = edges_to_csr(np.zeros(0, np.int64), np.zeros(0, np.int64), 10)
    dev = smp.DeviceCSR.from_host(host, 20, membership="hash")
    rows = jnp.asarray(np.arange(10) % 10)
    cands = jnp.asarray(np.arange(20).reshape(10, 2))
    assert not np.asarray(smp.row_contains(dev, rows, cands)).any()


def test_samplers_bit_equal_across_membership_modes(csr_pair):
    host, _ = csr_pair
    dev_h = smp.DeviceCSR.from_host(host, 60, membership="hash")
    dev_b = smp.DeviceCSR.from_host(host, 60, membership="bsearch")
    rows = jnp.asarray(np.resize(np.nonzero(host.degrees() > 0)[0], 128))
    key = jax.random.PRNGKey(5)
    neg_h = np.asarray(smp.sample_negatives_uniform(key, dev_h, rows, 60))
    neg_b = np.asarray(smp.sample_negatives_uniform(key, dev_b, rows, 60))
    np.testing.assert_array_equal(neg_h, neg_b)


def test_hash_membership_duplicate_pairs():
    """Real review data repeats (user, item) pairs; >SLOTS duplicates of
    one pair must not wedge the bucket-doubling loop."""
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.membership import (
        SLOTS, HashMembership)
    rows = np.concatenate([np.zeros(SLOTS + 5, np.int64), [1, 2]])
    cols = np.concatenate([np.full(SLOTS + 5, 7, np.int64), [3, 4]])
    hm = HashMembership.build(rows, cols)
    got = np.asarray(hm.contains(jnp.asarray([0, 0, 1, 2, 2]),
                                 jnp.asarray([7, 3, 3, 4, 7])))
    np.testing.assert_array_equal(got, [True, False, True, True, False])
