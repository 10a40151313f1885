"""Probe: where the full-catalog eval time goes at the 10M north star.

The scaled_10m protocol is eval-dominated (~61 s/eval vs 2.6 s/train
epoch).  Candidate costs per 512-user batch over a 1M-item catalog:
host exclusion-row assembly (numpy CSR slicing), H2D transfer, the
(B, I) score matmul, masked top-k, and metric reduction.

Usage: python scripts/probe_eval_breakdown.py [--batches 6]
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
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--scale", default="large")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--topk", default="exact", choices=["exact", "approx"])
    ap.add_argument("--score-dtype", default="fp32",
                    choices=["fp32", "bf16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_graph
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.eval.ranking import (
        EvalContext, _full_batch)

    graph = build_graph(args.scale)
    D = 128
    ctx = EvalContext.build(graph)
    users_all = ctx.eval_users["val"]
    rng = np.random.default_rng(0)
    user_emb = jnp.asarray(rng.normal(size=(graph.num_users, D)) * 0.1,
                           jnp.float32)
    item_emb = jnp.asarray(rng.normal(size=(graph.num_items, D)) * 0.1,
                           jnp.float32)

    B = args.batch
    n_eval_batches = -(-users_all.size // B)
    print(f"[evalbd] eval users={users_all.size:,} -> {n_eval_batches:,} "
          f"batches of {B}", flush=True)

    t_host = t_xfer = t_dev = 0.0
    for bi in range(args.batches):
        bu_host = users_all[bi * B:(bi + 1) * B]
        if bu_host.size < B:
            bu_host = np.concatenate([bu_host,
                                      np.zeros(B - bu_host.size, np.int64)])
        t0 = time.perf_counter()
        excl_np = ctx.train_exclusion_rows(bu_host)
        t1 = time.perf_counter()
        excl = jnp.asarray(excl_np)
        bu = jnp.asarray(bu_host, jnp.int32)
        jax.block_until_ready(excl)
        t2 = time.perf_counter()
        out = _full_batch(user_emb, item_emb, bu, excl, ctx.split_csr("val"),
                          ctx.item_pop_dev, (10, 20), False,
                          ctx.total_train, graph.num_items,
                          topk=args.topk, score_dtype=args.score_dtype)
        jax.block_until_ready(out)
        t3 = time.perf_counter()
        if bi == 0:   # skip compile batch in the averages
            continue
        t_host += t1 - t0
        t_xfer += t2 - t1
        t_dev += t3 - t2
    n = args.batches - 1
    tot = (t_host + t_xfer + t_dev) / n
    print(f"[evalbd] per batch: host excl {t_host/n*1e3:7.1f} ms | "
          f"h2d {t_xfer/n*1e3:7.1f} ms | device (scores+topk+metrics) "
          f"{t_dev/n*1e3:7.1f} ms | total {tot*1e3:.1f} ms", flush=True)
    print(f"[evalbd] full-eval projection: {tot*n_eval_batches:.1f} s "
          f"over {n_eval_batches} batches", flush=True)


if __name__ == "__main__":
    main()
