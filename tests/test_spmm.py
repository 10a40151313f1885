"""Weighted SpMM operator vs dense oracle, forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.operators import (
    EdgeMap, symmetric_norm_edge_map)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.spmm import SpmmOperator


def _random_edge_map(rng, num_src=37, num_dst=29, E=150):
    return EdgeMap(
        src=rng.integers(0, num_src, E).astype(np.int32),
        dst=rng.integers(0, num_dst, E).astype(np.int32),
        w=rng.normal(size=E).astype(np.float32),
        num_src=num_src, num_dst=num_dst)


@pytest.mark.parametrize("D", [8, 64])
def test_spmm_forward_matches_dense(rng, D):
    em = _random_edge_map(rng)
    op = SpmmOperator(em, backend="xla")
    x = jnp.asarray(rng.normal(size=(em.num_src, D)).astype(np.float32))
    y = op(x)
    expect = em.to_dense() @ np.asarray(x, np.float64)
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-4, atol=1e-4)


def test_spmm_backward_is_transpose(rng):
    em = _random_edge_map(rng, E=80)
    op = SpmmOperator(em, backend="xla")
    x = jnp.asarray(rng.normal(size=(em.num_src, 16)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(em.num_dst, 16)).astype(np.float32))

    def f(x):
        return jnp.sum(op(x) * cot)

    dx = jax.grad(f)(x)
    expect = em.to_dense().T @ np.asarray(cot, np.float64)
    np.testing.assert_allclose(np.asarray(dx), expect, rtol=1e-4, atol=1e-4)


def test_spmm_empty_rows(rng):
    """Destinations with no incoming edges must be exactly zero."""
    em = EdgeMap(src=np.array([0, 1], np.int32), dst=np.array([2, 2], np.int32),
                 w=np.array([1.0, 2.0], np.float32), num_src=3, num_dst=5)
    op = SpmmOperator(em, backend="xla")
    x = jnp.ones((3, 4))
    y = np.asarray(op(x))
    np.testing.assert_allclose(y[2], 3.0)
    np.testing.assert_allclose(y[[0, 1, 3, 4]], 0.0)


def test_spmm_duplicate_edges_accumulate(rng):
    em = EdgeMap(src=np.array([1, 1, 1], np.int32), dst=np.array([0, 0, 0], np.int32),
                 w=np.array([0.5, 0.25, 0.25], np.float32), num_src=2, num_dst=1)
    op = SpmmOperator(em, backend="xla")
    x = jnp.asarray([[0.0], [4.0]])
    np.testing.assert_allclose(np.asarray(op(x)), [[4.0]])


def test_spmm_under_jit_and_grad(small_graph, rng):
    em = symmetric_norm_edge_map(small_graph)
    op = SpmmOperator(em, backend="xla")
    x = jnp.asarray(rng.normal(size=(em.num_src, 8)).astype(np.float32))

    @jax.jit
    def step(x):
        return jnp.sum(op(x) ** 2)

    g = jax.jit(jax.grad(step))(x)
    assert np.isfinite(np.asarray(g)).all()


# ---------------------------------------------------------------------------
# Pallas backend (interpret mode on CPU)
# ---------------------------------------------------------------------------

def test_pallas_plan_and_apply_matches_dense(rng):
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops import spmm_pallas as sp

    em = _random_edge_map(rng, num_src=50, num_dst=400, E=900)
    order = np.argsort(em.dst, kind="stable")
    plan = sp.build_pallas_segment_plan(
        em.src[order], em.dst[order], em.w[order], em.num_dst,
        num_src=em.num_src, block_rows=8, chunk_edges=16, interpret=True)
    x = jnp.asarray(rng.normal(size=(em.num_src, 4)).astype(np.float32))
    y = sp.apply_pallas(plan, x)
    expect = em.to_dense() @ np.asarray(x, np.float64)
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-4, atol=1e-4)


def test_pallas_empty_operator():
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops import spmm_pallas as sp
    plan = sp.build_pallas_segment_plan(
        np.zeros(0, np.int32), np.zeros(0, np.int32), np.zeros(0, np.float32),
        num_dst=7, num_src=5, block_rows=8, chunk_edges=16, interpret=True)
    y = sp.apply_pallas(plan, jnp.ones((5, 4)))
    np.testing.assert_allclose(np.asarray(y), 0.0)


def test_pallas_operator_end_to_end(small_graph, rng):
    """SpmmOperator with backend='pallas' (interpret) vs xla backend."""
    em = symmetric_norm_edge_map(small_graph)
    op_x = SpmmOperator(em, backend="xla")
    op_p = SpmmOperator(em, backend="pallas")
    x = jnp.asarray(rng.normal(size=(em.num_src, 8)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(op_p(x)), np.asarray(op_x(x)),
                               rtol=1e-4, atol=1e-4)
    cot = jnp.asarray(rng.normal(size=(em.num_dst, 8)).astype(np.float32))
    gx = jax.grad(lambda x: jnp.sum(op_x(x) * cot))(x)
    gp = jax.grad(lambda x: jnp.sum(op_p(x) * cot))(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-4)


def test_spmm_state_is_pytree_and_arg_threadable(rng):
    """Operator state must flow through jit as an argument (HLO-constant
    bloat guard) and produce identical results to the closure path."""
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.spmm import spmm_apply
    em = _random_edge_map(rng, E=120)
    op = SpmmOperator(em, backend="xla")
    x = jnp.asarray(rng.normal(size=(em.num_src, 8)).astype(np.float32))

    leaves, treedef = jax.tree.flatten(op.state)
    assert all(hasattr(l, "shape") for l in leaves)

    @jax.jit
    def f(state_pair, x):
        return spmm_apply(state_pair[0], state_pair[1], x)

    np.testing.assert_allclose(np.asarray(f(op.state, x)),
                               np.asarray(op(x)), rtol=1e-6)
    # gradient flows through the arg-threaded path too
    g = jax.grad(lambda x: jnp.sum(f(op.state, x)))(x)
    expect = em.to_dense().T @ np.ones((em.num_dst, 8))
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-4, atol=1e-4)


def test_transpose_apply(rng):
    em = _random_edge_map(rng, E=90)
    op = SpmmOperator(em, backend="xla")
    y = jnp.asarray(rng.normal(size=(em.num_dst, 4)).astype(np.float32))
    got = np.asarray(op.transpose_apply(y))
    expect = em.to_dense().T @ np.asarray(y, np.float64)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_resolve_backend():
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.spmm import resolve_backend
    assert resolve_backend("xla") == "xla"
    assert resolve_backend("pallas") == "pallas"
    assert resolve_backend("auto") in ("xla", "pallas")  # cpu tests -> xla


def test_pallas_bf16_mode_close_to_fp32(rng):
    """spmm_precision='bf16' quantizes gather/messages to bfloat16 but keeps
    fp32 accumulation — results within bf16 rounding of the dense oracle."""
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops import spmm_pallas as sp

    em = _random_edge_map(rng, num_src=60, num_dst=300, E=1200)
    order = np.argsort(em.dst, kind="stable")
    plan = sp.build_pallas_segment_plan(
        em.src[order], em.dst[order], em.w[order], em.num_dst,
        num_src=em.num_src, block_rows=8, chunk_edges=16, interpret=True,
        msg_dtype="bfloat16")
    x = jnp.asarray(rng.normal(size=(em.num_src, 8)).astype(np.float32))
    y = sp.apply_pallas(plan, x)
    assert y.dtype == x.dtype  # output restored to input dtype
    expect = em.to_dense() @ np.asarray(x, np.float64)
    scale = np.abs(expect).max() + 1e-6
    err = np.abs(np.asarray(y, np.float64) - expect).max() / scale
    assert err < 3e-2, err  # bf16 inputs: ~8-bit mantissa
    # and meaningfully different tolerance class from exact-fp32 path
    plan32 = sp.build_pallas_segment_plan(
        em.src[order], em.dst[order], em.w[order], em.num_dst,
        num_src=em.num_src, block_rows=8, chunk_edges=16, interpret=True)
    y32 = sp.apply_pallas(plan32, x)
    np.testing.assert_allclose(np.asarray(y32), expect, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Round-2 kernel refinements: window plans + padded chain
# ---------------------------------------------------------------------------

def test_pallas_window_plan_matches_dense(rng):
    """Forced window kernel (W < R, dynamic 8-aligned offset) vs dense."""
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops import spmm_pallas as sp

    # high mean degree so windows are narrow relative to blocks
    em = _random_edge_map(rng, num_src=200, num_dst=40, E=2000)
    order = np.argsort(em.dst, kind="stable")
    plan = sp.build_pallas_segment_plan(
        em.src[order], em.dst[order], em.w[order], em.num_dst,
        num_src=em.num_src, block_rows=32, chunk_edges=16, interpret=True,
        window=8)
    assert plan.window == 8 and plan.win_start is not None
    x = jnp.asarray(rng.normal(size=(em.num_src, 4)).astype(np.float32))
    y = sp.apply_pallas(plan, x)
    expect = em.to_dense() @ np.asarray(x, np.float64)
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-4, atol=1e-4)


def test_pallas_window_auto_selection(rng):
    """'auto' keeps the window only when it does not inflate padding:
    high-degree destinations accept it, low-degree ones reject it."""
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops import spmm_pallas as sp

    # ~13 edges per dst row: chunk spans ~ T/13 rows -> window wins
    em = _random_edge_map(rng, num_src=500, num_dst=150, E=2000)
    order = np.argsort(em.dst, kind="stable")
    dense_plan = sp.build_pallas_segment_plan(
        em.src[order], em.dst[order], em.w[order], em.num_dst,
        num_src=em.num_src, interpret=True, window="auto")
    assert dense_plan.window > 0

    # ~0.25 edges per dst row: window splits would explode padding -> off
    em2 = _random_edge_map(rng, num_src=50, num_dst=8000, E=2000)
    order2 = np.argsort(em2.dst, kind="stable")
    sparse_plan = sp.build_pallas_segment_plan(
        em2.src[order2], em2.dst[order2], em2.w[order2], em2.num_dst,
        num_src=em2.num_src, interpret=True, window="auto")
    assert sparse_plan.window == 0


def test_spmm_padded_chain_matches_plain(rng):
    """apply_padded on a tail-padded table == apply, after truncation; the
    VJP routes through the padded transpose plan."""
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.spmm import (
        spmm_apply_padded)

    em = _random_edge_map(rng, num_src=37, num_dst=29, E=300)
    op = SpmmOperator(em, backend="pallas", block_rows=8, chunk_edges=16)
    assert op.padded_chain
    assert op.src_layout.padded_rows % 8 == 0
    assert op.dst_layout.padded_rows >= em.num_dst

    x = jnp.asarray(rng.normal(size=(em.num_src, 4)).astype(np.float32))
    x_pad = op.src_layout.to_padded(x)
    y_pad = op.apply_padded(x_pad)
    assert y_pad.shape[0] == op.dst_layout.padded_rows
    np.testing.assert_allclose(np.asarray(op.dst_layout.from_padded(y_pad)),
                               np.asarray(op(x)), rtol=1e-5, atol=1e-5)
    # pad rows are identically zero
    np.testing.assert_allclose(np.asarray(y_pad[em.num_dst:]), 0.0)

    # gradient: d/dx sum(A_pad x_pad * c) == A^T c on the real rows
    cot = rng.normal(size=(op.dst_layout.padded_rows, 4)).astype(np.float32)
    cot[em.num_dst:] = 0.0
    cot = jnp.asarray(cot)

    def f(x):
        return jnp.sum(spmm_apply_padded(op.fwd_state, op.bwd_state,
                                         op.src_layout.to_padded(x)) * cot)

    dx = jax.grad(f)(x)
    expect = em.to_dense().T @ np.asarray(cot[:em.num_dst], np.float64)
    np.testing.assert_allclose(np.asarray(dx), expect, rtol=1e-4, atol=1e-4)


def test_sliced_plans_match_unsliced(rng):
    """Dst-sliced pipelining (block-aligned cuts) must be BIT-identical to
    the single plan in both dense and padded-chain forms."""
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops import spmm_pallas as sp

    em = _random_edge_map(rng, num_src=50, num_dst=400, E=900)
    order = np.argsort(em.dst, kind="stable")
    src, dst, w = em.src[order], em.dst[order], em.w[order]
    x = jnp.asarray(rng.normal(size=(em.num_src, 4)).astype(np.float32))

    single = sp.build_pallas_segment_plan(
        src, dst, w, em.num_dst, num_src=em.num_src, block_rows=8,
        chunk_edges=16, interpret=True)
    y1 = np.asarray(sp.apply_pallas(single, x))

    for S in (2, 3, 4):
        plans = sp.build_sliced_segment_plans(
            src, dst, w, em.num_dst, num_src=em.num_src, block_rows=8,
            chunk_edges=16, interpret=True, slices=S)
        assert len(plans) == S
        assert sum(p.num_dst for p in plans) == em.num_dst
        yS = np.asarray(sp.apply_pallas(plans, x))
        np.testing.assert_array_equal(yS, y1)
        # padded-chain form: concatenated slice block spaces == single's
        total_blocks = sum(p.num_blocks for p in plans)
        assert total_blocks == single.num_blocks
        xp = jnp.pad(x, ((0, 0), (0, 0)))
        pS = np.asarray(sp.apply_pallas_padded(plans, xp))
        p1 = np.asarray(sp.apply_pallas_padded(single, xp))
        np.testing.assert_array_equal(pS, p1)


def test_sliced_plans_single_block_degenerates(rng):
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops import spmm_pallas as sp
    em = _random_edge_map(rng, num_src=10, num_dst=6, E=20)
    order = np.argsort(em.dst, kind="stable")
    plans = sp.build_sliced_segment_plans(
        em.src[order], em.dst[order], em.w[order], em.num_dst,
        num_src=em.num_src, block_rows=8, chunk_edges=16, interpret=True,
        slices="auto")
    assert len(plans) == 1


def test_sliced_plans_share_forced_window(rng):
    """Window choice is made once on the full operator and forced on every
    slice — per-slice 'auto' could diverge and break bit-identity."""
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops import spmm_pallas as sp

    # high mean destination degree so window='auto' selects a window
    num_src, num_dst, E = 300, 1024, 16384
    src = rng.integers(0, num_src, E).astype(np.int32)
    dst = np.sort(rng.integers(0, num_dst, E)).astype(np.int64)
    w = rng.normal(size=E).astype(np.float32)

    single = sp.build_pallas_segment_plan(
        src, dst, w, num_dst, num_src=num_src, block_rows=512,
        chunk_edges=256, interpret=True, window="auto")
    assert single.window > 0, "test premise: auto should pick a window here"
    plans = sp.build_sliced_segment_plans(
        src, dst, w, num_dst, num_src=num_src, block_rows=512,
        chunk_edges=256, interpret=True, window="auto", slices=2)
    assert len(plans) == 2
    assert all(p.window == single.window for p in plans)
    x = jnp.asarray(rng.normal(size=(num_src, 8)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(sp.apply_pallas(plans, x)),
        np.asarray(sp.apply_pallas(single, x)))


def _build_window_loop_oracle(src, dst, w, num_dst, num_blocks, R, T, W):
    """Sequential greedy window chunking (the original per-block Python
    loop) — the oracle the vectorized ``_build_window`` must match
    bit-for-bit."""
    blk_of_edge = dst // R
    lid_all = (dst - blk_of_edge * R).astype(np.int64)
    counts = np.bincount(blk_of_edge, minlength=num_blocks)
    edge_start = np.zeros(num_blocks + 1, np.int64)
    np.cumsum(counts, out=edge_start[1:])

    chunks = []
    for b in range(num_blocks):
        s, e = int(edge_start[b]), int(edge_start[b + 1])
        if s == e:
            chunks.append((b, s, s, 0))
            continue
        i = s
        while i < e:
            ws = min((int(lid_all[i]) // 8) * 8, R - W)
            j = int(np.searchsorted(lid_all[s:e], ws + W, side="left")) + s
            j = min(j, i + T, e)
            chunks.append((b, i, j, ws))
            i = j

    G = len(chunks)
    src_p = np.zeros(G * T, np.int32)
    w_p = np.zeros(G * T, np.float32)
    lid_p = np.full(G * T, W, np.int32)
    block_id = np.zeros(G, np.int32)
    wstart = np.zeros(G, np.int32)
    first = np.zeros(G, np.int32)
    prev_b = -1
    for g, (b, i, j, ws) in enumerate(chunks):
        n = j - i
        src_p[g * T:g * T + n] = src[i:j]
        w_p[g * T:g * T + n] = w[i:j]
        lid_p[g * T:g * T + n] = lid_all[i:j] - ws
        block_id[g] = b
        wstart[g] = ws
        if b != prev_b:
            first[g] = 1
            prev_b = b
    return src_p, w_p, lid_p, block_id, first, wstart


@pytest.mark.parametrize("num_dst,E,R,T,W", [
    (40, 2000, 32, 16, 8),       # dense rows, many chunks per window
    (300, 900, 64, 32, 16),      # sparse rows + empty blocks
    (100, 1500, 32, 64, 8),      # hub-heavy (power-law head)
    (7, 60, 32, 16, 24),         # single block, W not a divisor of R
])
def test_build_window_vectorized_matches_loop(rng, num_dst, E, R, T, W):
    """The vectorized greedy window planner is bit-identical to the
    sequential per-block loop it replaced (10M-scale startup cost)."""
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops import spmm_pallas as sp

    src = rng.integers(0, 50, E).astype(np.int32)
    if num_dst == 100:  # zipf head: half the edges hit 3 rows
        dst = np.where(rng.random(E) < 0.5, rng.integers(0, 3, E),
                       rng.integers(0, num_dst, E)).astype(np.int32)
    else:
        dst = rng.integers(0, num_dst, E).astype(np.int32)
    w = rng.normal(size=E).astype(np.float32)
    order = np.argsort(dst, kind="stable")
    src, dst, w = src[order], dst[order].astype(np.int64), w[order]
    num_blocks = max(-(-num_dst // R), 1)

    got = sp._build_window(src, dst, w, num_dst, num_blocks, R, T, W)
    want = _build_window_loop_oracle(src, dst, w, num_dst, num_blocks,
                                     R, T, W)
    for g, x, name in zip(got, want, ("src", "w", "lid", "block_id",
                                      "first", "wstart")):
        np.testing.assert_array_equal(g, x, err_msg=name)
