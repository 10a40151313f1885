"""Ablation breakdown of the bench train step on the real chip.

Times progressively smaller slices of the full jitted BPR train step at
reference scale to localize non-SpMM cost (sampling, scoring, layer combine,
backward, Adam).
"""
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (  # noqa: E402
    synthetic_bipartite_graph)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models import losses  # noqa: E402
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models.lightgcn import (  # noqa: E402
    LightGCN, ego_tables, init_params)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.sampling import (  # noqa: E402
    DeviceCSR, sample_negatives_uniform, sample_positives)
from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (  # noqa: E402
    RecConfig)


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    graph = synthetic_bipartite_graph(58_867, 261_728, 7.9, seed=0, power=1.0)
    cfg = RecConfig(name="probe", propagation="gauss_seidel",
                    weight_mode="cu_message", table_layout="split",
                    emb_dim=64, num_layers=3, batch_size=4096,
                    spmm_backend="pallas")
    rng = np.random.default_rng(0)
    cred = rng.uniform(0.2, 1.0, graph.num_users).astype(np.float32)
    model = LightGCN(cfg, graph, cred)
    params = init_params(jax.random.PRNGKey(0), cfg, graph.num_users,
                         graph.num_items)
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)
    csr = DeviceCSR.from_host(graph.user_csr("train"), graph.num_items)
    bundle = {"model": model.state, "csr": csr}
    users = jnp.asarray(rng.integers(0, graph.num_users, cfg.batch_size),
                        jnp.int32)
    key = jax.random.PRNGKey(1)

    # 1. sampling only
    @jax.jit
    def f_sample(key, bundle):
        kp, kn = jax.random.split(key)
        pos = sample_positives(kp, bundle["csr"], users)
        neg = sample_negatives_uniform(kn, bundle["csr"], users,
                                       graph.num_items, rounds=cfg.neg_rounds)
        return pos, neg
    t = timeit(f_sample, key, bundle)
    print(f"sampling only                 : {t*1e3:7.3f} ms")
    pos, neg = f_sample(key, bundle)

    # 2. forward propagate only (sum to scalar to avoid output copy)
    @jax.jit
    def f_prop(params, bundle):
        ue, ie = model.propagate(params, bundle["model"])
        return ue.sum() + ie.sum()
    t = timeit(f_prop, params, bundle)
    print(f"fwd propagate (K=3, 6 spmm)   : {t*1e3:7.3f} ms")

    # 3. forward loss (propagate + score + bpr + ego_l2)
    def loss_fn(params, bundle):
        ue, ie = model.propagate(params, bundle["model"])
        pos_s = LightGCN.score(ue, ie, users, pos)
        neg_s = LightGCN.score(ue, ie, users, neg)
        l = losses.bpr_loss(pos_s, neg_s)
        eu, ei = ego_tables(params, graph.num_users)
        return l + cfg.reg * losses.ego_l2(eu[users], ei[pos], ei[neg])
    f_loss = jax.jit(loss_fn)
    t = timeit(f_loss, params, bundle)
    print(f"fwd loss                      : {t*1e3:7.3f} ms")

    # 4. value_and_grad (fwd + bwd: 12 spmm)
    f_grad = jax.jit(lambda p, b: jax.value_and_grad(loss_fn)(p, b))
    t = timeit(f_grad, params, bundle)
    print(f"fwd+bwd loss (12 spmm)        : {t*1e3:7.3f} ms")

    # 5. full step (grad + adam), donated
    def step(params, opt_state, bundle):
        loss, grads = jax.value_and_grad(loss_fn)(params, bundle)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss
    f_step = jax.jit(step, donate_argnums=(0, 1))
    # re-init donated buffers each call is wrong for timing; use undonated too
    f_step_nodon = jax.jit(step)
    t = timeit(f_step_nodon, params, opt_state, bundle)
    print(f"full step (no donation)       : {t*1e3:7.3f} ms")

    # 6. adam update alone (before donation timing deletes buffers)
    grads = jax.tree.map(jnp.ones_like, params)
    @jax.jit
    def f_adam(grads, opt_state, params):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state
    t = timeit(f_adam, grads, opt_state, params)
    print(f"adam update alone             : {t*1e3:7.3f} ms")

    p = jax.tree.map(jnp.copy, params)
    o = jax.tree.map(jnp.copy, opt_state)
    for _ in range(3):
        p, o, l = f_step(p, o, bundle)
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    for _ in range(20):
        p, o, l = f_step(p, o, bundle)
    jax.block_until_ready(l)
    t = (time.perf_counter() - t0) / 20
    print(f"full step (donated)           : {t*1e3:7.3f} ms")

    # 7. propagate fwd+bwd WITHOUT layer-mean combine (last layer only)
    def loss_last(params, bundle):
        state = bundle["model"]
        u, i = ego_tables(params, graph.num_users)
        for _ in range(cfg.num_layers):
            from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.spmm import spmm_apply
            i = spmm_apply(state["ifu"][0], state["ifu"][1], u)
            u = spmm_apply(state["ufi"][0], state["ufi"][1], i)
        pos_s = LightGCN.score(u, i, users, pos)
        neg_s = LightGCN.score(u, i, users, neg)
        return losses.bpr_loss(pos_s, neg_s)
    f_last = jax.jit(lambda p, b: jax.value_and_grad(loss_last)(p, b))
    t = timeit(f_last, params, bundle)
    print(f"fwd+bwd, NO layer combine     : {t*1e3:7.3f} ms")

    # 8. batch-row combine: gather each layer's batch rows, combine B-rows
    def loss_rows(params, bundle):
        state = bundle["model"]
        u, i = ego_tables(params, graph.num_users)
        au = u[users]
        ap = i[pos]
        an = i[neg]
        from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.spmm import spmm_apply
        for _ in range(cfg.num_layers):
            i = spmm_apply(state["ifu"][0], state["ifu"][1], u)
            u = spmm_apply(state["ufi"][0], state["ufi"][1], i)
            au = au + u[users]
            ap = ap + i[pos]
            an = an + i[neg]
        K1 = cfg.num_layers + 1
        pos_s = jnp.sum(au * ap, -1) / (K1 * K1)
        neg_s = jnp.sum(au * an, -1) / (K1 * K1)
        l = losses.bpr_loss(pos_s, neg_s)
        eu, ei = ego_tables(params, graph.num_users)
        return l + cfg.reg * losses.ego_l2(eu[users], ei[pos], ei[neg])
    f_rows = jax.jit(lambda p, b: jax.value_and_grad(loss_rows)(p, b))
    t = timeit(f_rows, params, bundle)
    print(f"fwd+bwd, batch-row combine    : {t*1e3:7.3f} ms")

    # verify equivalence of batch-row combine vs table combine
    l1 = float(f_loss(params, bundle))
    l2 = float(jax.jit(loss_rows)(params, bundle))
    print(f"loss table-combine={l1:.6f}  row-combine={l2:.6f}")


if __name__ == "__main__":
    main()
