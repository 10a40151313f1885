"""Ablate the real scanned-epoch train step at reference scale.

Decomposes the ~31 ms/step epoch-mode cost (bench.py --mode epoch) into:
sampling (hoisted, amortized), forward propagation, backward, Adam — by
timing progressively smaller variants of the SAME scanned epoch.  Run on
the real chip.
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (  # noqa: E402
    synthetic_bipartite_graph)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import (  # noqa: E402
    RecTrainer)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models.lightgcn import (  # noqa: E402
    LightGCN, ego_tables)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models import losses  # noqa: E402
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (  # noqa: E402
    RecConfig)


def chain_time(fn, state, iters=8, warmup=2):
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
    params, opt_state, key = tr.init_state(0)
    bundle = tr.train_state_bundle()
    B = cfg.batch_size
    n = tr.train_users.size
    nb = -(-n // B)
    n_pad = nb * B
    print(f"nb={nb} batches/epoch")

    epoch_fn = tr._build_epoch_fn()

    def full(state):
        p, o, k = state
        p, o, k, loss = epoch_fn(p, o, k, tr.train_users_dev, bundle)
        return (p, o, k)

    # epoch_fn donates params/opt_state — give it private copies
    t_full = chain_time(full, (jax.tree.map(jnp.copy, params),
                               jax.tree.map(jnp.copy, opt_state), key))
    print(f"A full epoch           : {t_full*1e3:7.1f} ms  "
          f"({t_full/nb*1e3:6.2f} ms/step)")

    # ---- B: sampling only (the hoisted epoch draw) --------------------
    @jax.jit
    def samp(key, users_flat):
        k, ks = jax.random.split(key)
        pos, neg = tr._sample_epoch(ks, users_flat, bundle)
        return k, pos.sum() + neg.sum()

    users_flat = jnp.asarray(
        np.resize(tr.train_users, n_pad).astype(np.int32))
    t_samp = chain_time(lambda s: samp(s[0], users_flat)[:1] + (s[1],),
                        (key, 0))
    print(f"B epoch sampling draw  : {t_samp*1e3:7.1f} ms  "
          f"({t_samp/nb*1e3:6.2f} ms/step amortized)")

    # ---- C: scanned forward-only (no grad/adam) ------------------------
    users_all = users_flat.reshape(nb, B)
    pos_all = jnp.zeros((nb, B), jnp.int32)
    neg_all = jnp.ones((nb, B), jnp.int32)
    mask_all = jnp.ones((nb, B), bool)

    def mk_scan(body):
        @jax.jit
        def run(params, x):
            def stepf(c, b):
                return c, body(params, *b)
            _, out = jax.lax.scan(stepf, None, x)
            return out.sum()
        return run

    fwd = mk_scan(lambda p, u, m, po, ng: tr._loss_fn(
        p, u, po, ng, m, bundle, None))
    xs = (users_all, mask_all, pos_all, neg_all)
    t_fwd = chain_time(lambda s: (fwd(params, xs),), ((),), iters=4)
    print(f"C scanned fwd loss     : {t_fwd*1e3:7.1f} ms  "
          f"({t_fwd/nb*1e3:6.2f} ms/step)")

    # ---- D: scanned fwd+grad (no adam) ---------------------------------
    gradv = jax.value_and_grad(tr._loss_fn)

    @jax.jit
    def fwdbwd(params, x):
        def stepf(c, b):
            u, m, po, ng = b
            loss, g = gradv(params, u, po, ng, m, bundle, None)
            return c, loss + sum(jnp.sum(t) for t in g.values())
        _, out = jax.lax.scan(stepf, None, x)
        return out.sum()

    t_fb = chain_time(lambda s: (fwdbwd(params, xs),), ((),), iters=4)
    print(f"D scanned fwd+bwd      : {t_fb*1e3:7.1f} ms  "
          f"({t_fb/nb*1e3:6.2f} ms/step)")

    # ---- E: table-combine variant of the loss (propagate full tables) --
    def loss_tablecomb(p, u, po, ng, m):
        ue, ie = tr.model.propagate(p, bundle["model"])
        pos_s = LightGCN.score(ue, ie, u, po)
        neg_s = LightGCN.score(ue, ie, u, ng)
        loss = losses.bpr_loss(pos_s, neg_s, m)
        eu, ei = ego_tables(p, graph.num_users)
        return loss + cfg.reg * losses.ego_l2(eu[u], ei[po], ei[ng], m)

    gradt = jax.value_and_grad(loss_tablecomb)

    @jax.jit
    def fwdbwd_t(params, x):
        def stepf(c, b):
            u, m, po, ng = b
            loss, g = gradt(params, u, po, ng, m)
            return c, loss + sum(jnp.sum(t) for t in g.values())
        _, out = jax.lax.scan(stepf, None, x)
        return out.sum()

    t_fbt = chain_time(lambda s: (fwdbwd_t(params, xs),), ((),), iters=4)
    print(f"E fwd+bwd table-combine: {t_fbt*1e3:7.1f} ms  "
          f"({t_fbt/nb*1e3:6.2f} ms/step)")

    # ---- F: propagation-only grad (no batch gathers at all) ------------
    def loss_prop(p):
        ue, ie = tr.model.propagate(p, bundle["model"])
        return jnp.sum(ue * ue) * 1e-6 + jnp.sum(ie * ie) * 1e-6

    gp = jax.grad(loss_prop)

    @jax.jit
    def prop_scan(params):
        def stepf(c, _):
            g = gp(params)
            return c, sum(jnp.sum(t) for t in g.values())
        _, out = jax.lax.scan(stepf, None, jnp.arange(nb))
        return out.sum()

    t_pg = chain_time(lambda s: (prop_scan(params),), ((),), iters=4)
    print(f"F prop-only fwd+bwd    : {t_pg*1e3:7.1f} ms  "
          f"({t_pg/nb*1e3:6.2f} ms/step)")


if __name__ == "__main__":
    main()
