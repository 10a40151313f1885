"""Probe: forced narrow windows on the ITEM-destination SpMM direction.

The one-hot build is ~80% of the Pallas kernel's time (VPU compare+select
over (R, T) per chunk; the MXU dot is ~0.16 ms of a ~0.7 ms kernel).  The
window planner already narrows R->W on the user-destination direction
(mean degree ~6 -> W=64), but auto-REJECTS the window on the
item-destination direction (mean degree ~1.4 -> W=256 qualifies) because
its padded edge count exceeds the 1.02x slack — a rule tuned when the
kernel was believed gather-traffic bound.  Round-2b showed the step is
latency/occupancy bound, so paying a few % more gather for 2x less VPU
work per chunk should win.  Variants (full train step, ref scale, same
harness as probe_dsplit.py):

  A  shipped auto planning          (item dir: plain (512, T) kernel)
  B  force W=256 on item-dst ops    (halves the one-hot)
  C  force W=128 on item-dst ops    (narrower still: more chunk splits)

int16 iota ("16-bit iota not supported by hardware") and bf16-stored
weights (invalid i1 relayout (8,128)->(16,128)) were both measured as
Mosaic dead ends first — see scripts/probe_onehot.py.

Usage: python scripts/probe_window_force.py [--precision bf16] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--scale", default="ref")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from bench import build_graph
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models import (
        losses)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models.lightgcn import (
        LightGCN, ego_tables, init_params)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops import (
        spmm_pallas as sp)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (
        RecConfig)

    graph = build_graph(args.scale)
    E = graph.train_edges.shape[1]
    D, K, B = 64, 3, 4096
    cred = np.random.default_rng(0).uniform(
        0.2, 1.0, graph.num_users).astype(np.float32)
    rng = np.random.default_rng(1)
    users = jnp.asarray(rng.integers(0, graph.num_users, B), jnp.int32)
    pos = jnp.asarray(rng.integers(0, graph.num_items, B), jnp.int32)
    neg = jnp.asarray(rng.integers(0, graph.num_items, B), jnp.int32)
    items = jnp.concatenate([pos, neg])

    orig_builder = sp.build_pallas_segment_plan

    def make_builder(force_w):
        if force_w is None:
            return orig_builder

        @functools.wraps(orig_builder)
        def builder(src, dst, w, num_dst, **kw):
            # item-destination operators (fwd item<-user and the transpose
            # of user<-item) have USER sources: num_src < 100K at ref scale
            ns = kw.get("num_src")
            if kw.get("window", "auto") == "auto" and ns is not None \
                    and ns < 100_000:
                kw["window"] = force_w
            return orig_builder(src, dst, w, num_dst, **kw)
        return builder

    VARIANTS = {"A auto": None, "B W=256 item-dst": 256,
                "C W=128 item-dst": 128}

    results, ref_out = {}, None
    for label, force_w in VARIANTS.items():
        sp.build_pallas_segment_plan = make_builder(force_w)

        cfg = RecConfig(name="probe", propagation="gauss_seidel",
                        weight_mode="cu_message", table_layout="split",
                        emb_dim=D, num_layers=K, batch_size=B,
                        spmm_backend="pallas",
                        spmm_precision=args.precision)
        model = LightGCN(cfg, graph, cred)
        params = init_params(jax.random.PRNGKey(0), cfg, graph.num_users,
                             graph.num_items)
        optimizer = optax.adam(cfg.lr)
        opt_state = optimizer.init(params)
        bundle = model.state

        try:
            ue, ie = jax.jit(lambda p: model.propagate(p, bundle))(params)
            out = np.concatenate([np.asarray(ue).ravel(),
                                  np.asarray(ie).ravel()])
        except Exception as e:
            msg = str(e)
            i = msg.find("Mosaic")
            print(f"[winforce {args.precision}] {label}: COMPILE FAIL — "
                  f"{msg[i:i+200] if i >= 0 else msg[:200]}", flush=True)
            continue
        if ref_out is None:
            ref_out = out
        else:
            err = np.max(np.abs(out - ref_out))
            assert err < 1e-5, (label, err)

        def loss_fn(params):
            u_rows, i_rows = model.propagate_rows(params, users, items,
                                                  bundle)
            pos_s = jnp.sum(u_rows * i_rows[:B], axis=-1)
            neg_s = jnp.sum(u_rows * i_rows[B:], axis=-1)
            l = losses.bpr_loss(pos_s, neg_s)
            eu, ei = ego_tables(params, graph.num_users)
            return l + cfg.reg * losses.ego_l2(eu[users], ei[pos], ei[neg])

        def step(params, opt_state, t):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss + 0.0 * t

        jstep = jax.jit(step, donate_argnums=(0, 1))
        p = jax.tree.map(jnp.copy, params)
        o = jax.tree.map(jnp.copy, opt_state)
        for t in range(3):
            p, o, loss = jstep(p, o, float(t))
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for t in range(args.iters):
            p, o, loss = jstep(p, o, float(t))
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.iters
        results[label] = dt
        print(f"[winforce {args.precision}] {label}: {dt*1e3:.3f} ms/step "
              f"loss={float(loss):.4f}", flush=True)

    sp.build_pallas_segment_plan = orig_builder
    base = results.get("A auto")
    edges_per_step = E * K * 2 * 2
    for label, dt in results.items():
        print(f"[winforce] {label}: {dt/base:.3f}x of auto, "
              f"{edges_per_step/dt/1e6:.1f}M edges/s")


if __name__ == "__main__":
    main()
