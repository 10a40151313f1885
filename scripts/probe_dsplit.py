"""Probe: D-split overlap (VERDICT r3 item 5, docs/KERNEL.md round-3).

The bf16 step is bound by the serial 12-SpMM dependency chain (~1.2 ms
flat latency per serialized op).  Candidate: split D=64 into two
independent 32-column chains — same arithmetic (scores are a sum over D),
double the one-hot VPU work, but the two chains can interleave.

Measures the full jitted train step (sampling excluded; batch-row-combine
loss + backward + Adam, the ~96% component) at reference scale in three
variants:
  A  full-width D=64 chain          (the shipped path)
  B  two 32-column chains           (D-split)
  C  four 16-column chains          (exaggerated split: if B is a latency
                                     wash, C shows whether more overlap
                                     ever pays for more VPU work)

Usage: python scripts/probe_dsplit.py [--precision bf16] [--iters 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--scale", default="ref")
    ap.add_argument("--propagation", default="gauss_seidel")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from bench import build_graph
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models import (
        losses)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models.lightgcn import (
        LightGCN, ego_tables, init_params)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (
        RecConfig)

    graph = build_graph(args.scale)
    E = graph.train_edges.shape[1]
    D, K, B = 64, 3, 4096
    wm = {"gauss_seidel": "cu_message",
          "bipartite_sync": "cred_eq322"}[args.propagation]
    cfg = RecConfig(name="probe", propagation=args.propagation,
                    weight_mode=wm, table_layout="split", emb_dim=D,
                    num_layers=K, batch_size=B, spmm_backend="pallas",
                    spmm_precision=args.precision)
    cred = np.random.default_rng(0).uniform(
        0.2, 1.0, graph.num_users).astype(np.float32)
    model = LightGCN(cfg, graph, cred)
    params = init_params(jax.random.PRNGKey(0), cfg, graph.num_users,
                         graph.num_items)
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)
    bundle = model.state

    rng = np.random.default_rng(1)
    users = jnp.asarray(rng.integers(0, graph.num_users, B), jnp.int32)
    pos = jnp.asarray(rng.integers(0, graph.num_items, B), jnp.int32)
    neg = jnp.asarray(rng.integers(0, graph.num_items, B), jnp.int32)
    items = jnp.concatenate([pos, neg])

    def make_step(n_splits):
        def scores_split(params):
            w = D // n_splits
            pos_s = neg_s = 0.0
            for s in range(n_splits):
                sub = {k: v[:, s * w:(s + 1) * w] for k, v in params.items()}
                u_rows, i_rows = model.propagate_rows(sub, users, items,
                                                      bundle)
                pos_s = pos_s + jnp.sum(u_rows * i_rows[:B], axis=-1)
                neg_s = neg_s + jnp.sum(u_rows * i_rows[B:], axis=-1)
            return pos_s, neg_s

        def loss_fn(params):
            pos_s, neg_s = scores_split(params)
            l = losses.bpr_loss(pos_s, neg_s)
            eu, ei = ego_tables(params, graph.num_users)
            return l + cfg.reg * losses.ego_l2(eu[users], ei[pos], ei[neg])

        def step(params, opt_state, t):
            # t threads through to chain state between iters (relay rule:
            # identical-args repeats can report impossibly fast times)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss + 0.0 * t

        return jax.jit(step, donate_argnums=(0, 1))

    results = {}
    for n_splits, label in ((1, "A full-width"), (2, "B 2x32-col"),
                            (4, "C 4x16-col")):
        step = make_step(n_splits)
        # fresh copies: the jitted step donates its inputs
        p = jax.tree.map(jnp.copy, params)
        o = jax.tree.map(jnp.copy, opt_state)
        for t in range(3):
            p, o, loss = step(p, o, float(t))
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for t in range(args.iters):
            p, o, loss = step(p, o, float(t))
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.iters
        results[label] = dt
        print(f"[dsplit {args.propagation}/{args.precision}] {label}: "
              f"{dt*1e3:.3f} ms/step  loss={float(loss):.4f}",
              flush=True)

    base = results["A full-width"]
    for label, dt in results.items():
        print(f"[dsplit] {label}: {dt/base:.3f}x of full-width")
    edges_per_step = E * K * 2 * 2
    print(f"[dsplit] best: {edges_per_step/min(results.values())/1e6:.1f}M "
          f"edges/s vs A {edges_per_step/base/1e6:.1f}M edges/s")


if __name__ == "__main__":
    main()
