"""Decompose the train-step backward at reference scale.

D (scanned fwd+bwd) = 28.1 ms/step vs C (fwd) = 12.85 — backward adds
~15.3 ms.  The 6 transpose-SpMMs should cost ~= forward's 6 (~11.4).
This probe times: (1) one full propagate fwd, (2) one propagate fwd+bwd,
(3) grad of a batch-row-gather loss on FIXED tables (isolates the batch
scatter-adds), (4) a single SpMM fwd and its VJP.
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (  # noqa: E402
    synthetic_bipartite_graph)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import (  # noqa: E402
    RecTrainer)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (  # noqa: E402
    RecConfig)


def chain_time(fn, state, iters=20, warmup=3):
    for _ in range(warmup):
        state = fn(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / iters


def main():
    graph = synthetic_bipartite_graph(58_867, 261_728, 7.9, seed=0, power=1.0)
    cfg = RecConfig(name="probe", propagation="gauss_seidel",
                    weight_mode="cu_message", table_layout="split",
                    emb_dim=64, num_layers=3, batch_size=4096,
                    spmm_backend="pallas")
    cred = np.random.default_rng(0).uniform(
        0.2, 1.0, graph.num_users).astype(np.float32)
    tr = RecTrainer(cfg, graph, cred=cred, verbose=False)
    params, _, _ = tr.init_state(0)
    bundle = tr.train_state_bundle()
    B = cfg.batch_size
    rng = np.random.default_rng(1)
    users = jnp.asarray(rng.integers(0, graph.num_users, B), jnp.int32)
    pos = jnp.asarray(rng.integers(0, graph.num_items, B), jnp.int32)
    neg = jnp.asarray(rng.integers(0, graph.num_items, B), jnp.int32)

    # (1) one propagate forward, chained on params (prevent dedup)
    @jax.jit
    def prop_fwd(p):
        ue, ie = tr.model.propagate(p, bundle["model"])
        return {"user_emb": p["user_emb"] + 1e-12 * ue,
                "item_emb": p["item_emb"] + 1e-12 * ie}

    t1 = chain_time(lambda p: prop_fwd(p), params)
    print(f"1 propagate fwd            : {t1*1e3:7.2f} ms (6 SpMM)")

    # (2) propagate fwd+bwd
    g_prop = jax.grad(lambda p: sum(
        jnp.vdot(t, t) for t in tr.model.propagate(p, bundle["model"])))

    @jax.jit
    def prop_fb(p):
        g = g_prop(p)
        return jax.tree.map(lambda a, b: a + 1e-12 * b, p, g)

    t2 = chain_time(lambda p: prop_fb(p), params)
    print(f"2 propagate fwd+bwd        : {t2*1e3:7.2f} ms (12 SpMM)")

    # (3) batch-row gathers + scores + scatter backward on FIXED tables
    fixed_u = jnp.asarray(rng.standard_normal((graph.num_users, 64)),
                          jnp.float32)
    fixed_i = jnp.asarray(rng.standard_normal((graph.num_items, 64)),
                          jnp.float32)

    def row_loss(p):
        # mimic the per-layer row combine: 4 user + 4 item row-gather layers
        au = sum((p["user_emb"] + k * fixed_u)[users] for k in range(4))
        ai = sum((p["item_emb"] + k * fixed_i)[jnp.concatenate([pos, neg])]
                 for k in range(4))
        ps = jnp.sum(au * ai[:B], -1)
        ns = jnp.sum(au * ai[B:], -1)
        return jnp.mean(jax.nn.softplus(ns - ps))

    g_rows = jax.grad(row_loss)

    @jax.jit
    def rows_fb(p):
        g = g_rows(p)
        return jax.tree.map(lambda a, b: a + 1e-12 * b, p, g)

    t3 = chain_time(lambda p: rows_fb(p), params)
    print(f"3 row-gather loss fwd+bwd  : {t3*1e3:7.2f} ms (8 gathers + "
          f"8 scatters, no SpMM)")

    # (4) single SpMM fwd and fwd+bwd (item<-user direction)
    op_state = bundle["model"]["ifu"]
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.spmm import (  # noqa: E402
        spmm_apply)

    @jax.jit
    def one_fwd(p):
        y = spmm_apply(op_state[0], op_state[1], p["user_emb"])
        return {"user_emb": p["user_emb"] + 1e-12 * y[:graph.num_users, :1],
                "item_emb": p["item_emb"]}

    t4 = chain_time(lambda p: one_fwd(p), params)
    print(f"4 single SpMM fwd (i<-u)   : {t4*1e3:7.2f} ms")

    g_one = jax.grad(lambda p: jnp.vdot(
        spmm_apply(op_state[0], op_state[1], p["user_emb"]),
        fixed_i) * 1e-6)

    @jax.jit
    def one_fb(p):
        g = g_one(p)
        return jax.tree.map(lambda a, b: a + 1e-12 * b, p, g)

    t5 = chain_time(lambda p: one_fb(p), params)
    print(f"5 single SpMM fwd+bwd      : {t5*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
