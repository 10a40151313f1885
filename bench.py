"""Benchmark harness.

Measures Stage-B training throughput (the propagation-dominated BPR train
step) on a synthetic Amazon-class bipartite graph and prints ONE JSON line:

    {"metric": "train_edges_per_sec_per_chip", "value": ..., "unit":
     "edges/s", "vs_baseline": ...}

"value" counts propagation edge-traversals per wall-clock second for the
full jitted train step (sampling + K-layer propagation + BPR backward +
Adam) on one chip with the Pallas segment-sum SpMM backend.

"vs_baseline": the reference publishes no throughput numbers (SURVEY.md §6),
so the baseline is the same train step with the portable XLA
gather/scatter segment-sum backend in fp32 (the reference's arithmetic) —
i.e. the speedup the custom TPU path delivers over what stock XLA does
with the same model.  The default measured mode is bf16 messages with
fp32 accumulation, whose quality is measured identical to fp32 on both
eval protocols (docs/PRECISION.md); ``--precision fp32`` benches the
parity-default arithmetic.

Usage: python bench.py [--scale ref|small|large] [--backend pallas|xla]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_graph(scale: str):
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        synthetic_bipartite_graph)
    if scale == "small":
        return synthetic_bipartite_graph(2_000, 3_000, 16.0, seed=0, power=0.9)
    if scale == "ref":
        # reference dataset scale: 58.9K users / 262K items / ~464K edges
        return synthetic_bipartite_graph(58_867, 261_728, 7.9, seed=0, power=1.0)
    if scale == "large":
        # north-star class: multi-million-edge graph
        return synthetic_bipartite_graph(500_000, 1_000_000, 20.0, seed=0,
                                         power=1.0)
    raise ValueError(scale)


def make_epoch(graph, backend: str, emb_dim: int, num_layers: int,
               batch_size: int, seed: int = 0, precision: str = "fp32",
               propagation: str = "gauss_seidel"):
    """Time the REAL trainer epoch: RecTrainer's compiled ``lax.scan`` over
    all batches (epoch-hoisted sampling + per-batch propagation + BPR
    backward + Adam), exactly what ``fit()`` runs.  Returns
    (run_epoch, state, n_batches)."""
    import jax
    import numpy as np
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import (
        RecTrainer)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (
        RecConfig)

    wm = {"gauss_seidel": "cu_message", "symmetric": "symmetric",
          "bipartite_sync": "cred_eq322"}[propagation]
    cfg = RecConfig(name="bench", propagation=propagation, weight_mode=wm,
                    table_layout="split" if propagation != "symmetric"
                    else "joint",
                    emb_dim=emb_dim, num_layers=num_layers,
                    batch_size=batch_size, spmm_backend=backend,
                    spmm_precision=precision)
    cred = np.random.default_rng(seed).uniform(0.2, 1.0,
                                               graph.num_users).astype(np.float32)
    tr = RecTrainer(cfg, graph, cred=cred, verbose=False)
    params, opt_state, key = tr.init_state(seed)
    epoch_fn = tr._build_epoch_fn()
    nb = -(-tr.train_users.size // batch_size)
    bundle = tr.train_state_bundle()

    def run_epoch(state):
        params, opt_state, key = state
        params, opt_state, key, loss = epoch_fn(
            params, opt_state, key, tr.train_users_dev, bundle)
        return (params, opt_state, key), loss

    return run_epoch, (params, opt_state, key), nb


def time_epoch(run_epoch, state, iters: int, warmup: int = 2):
    import jax
    for _ in range(warmup):
        state, loss = run_epoch(state)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = run_epoch(state)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    return dt, float(loss)


def make_step(graph, backend: str, emb_dim: int, num_layers: int,
              batch_size: int, seed: int = 0, precision: str = "fp32",
              propagation: str = "gauss_seidel"):
    import jax
    import jax.numpy as jnp
    import optax
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models import losses
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models.lightgcn import (
        LightGCN, ego_tables, init_params)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.ops.sampling import (
        DeviceCSR, sample_negatives_uniform, sample_positives)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (
        RecConfig)

    wm = {"gauss_seidel": "cu_message", "symmetric": "symmetric",
          "bipartite_sync": "cred_eq322"}[propagation]
    cfg = RecConfig(name="bench", propagation=propagation, weight_mode=wm,
                    table_layout="split" if propagation != "symmetric"
                    else "joint",
                    emb_dim=emb_dim, num_layers=num_layers,
                    batch_size=batch_size, spmm_backend=backend,
                    spmm_precision=precision)
    cred = np.random.default_rng(seed).uniform(0.2, 1.0,
                                               graph.num_users).astype(np.float32)
    model = LightGCN(cfg, graph, cred)
    params = init_params(jax.random.PRNGKey(seed), cfg, graph.num_users,
                         graph.num_items)
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)
    train_csr = DeviceCSR.from_host(graph.user_csr("train"), graph.num_items)
    train_users = np.nonzero(graph.user_csr("train").degrees() > 0)[0]
    users_pool = jnp.asarray(
        np.resize(train_users, batch_size).astype(np.int32))

    # operator state + CSR flow through jit as arguments — closure capture
    # would inline multi-GB edge constants into the program at 10M+ edges
    bundle = {"model": model.state, "csr": train_csr}

    def step(params, opt_state, key, bundle):
        key, ks = jax.random.split(key)
        users = users_pool
        kp, kn = jax.random.split(ks)
        pos = sample_positives(kp, bundle["csr"], users)
        neg = sample_negatives_uniform(kn, bundle["csr"], users,
                                       graph.num_items,
                                       rounds=cfg.neg_rounds)

        def loss_fn(params):
            # batch-row combine (trainer semantics): per-layer rows are
            # gathered and averaged instead of materializing combined
            # tables — bit-identical scores, no full-table accumulation
            items = jnp.concatenate([pos, neg])
            u_rows, i_rows = model.propagate_rows(params, users, items,
                                                  bundle["model"])
            pos_s = jnp.sum(u_rows * i_rows[:batch_size], axis=-1)
            neg_s = jnp.sum(u_rows * i_rows[batch_size:], axis=-1)
            l = losses.bpr_loss(pos_s, neg_s)
            eu, ei = ego_tables(params, graph.num_users)
            return l + cfg.reg * losses.ego_l2(eu[users], ei[pos], ei[neg])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, key, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run_step(params, opt_state, key):
        return jitted(params, opt_state, key, bundle)

    return run_step, params, opt_state, cfg


def time_step(step, params, opt_state, iters: int, warmup: int = 3):
    import jax
    key = jax.random.PRNGKey(1)
    for _ in range(warmup):
        params, opt_state, key, loss = step(params, opt_state, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, key, loss = step(params, opt_state, key)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    return dt, float(loss)


def bench_northstar(iters: int = 3):
    """The 10M-edge north-star operating point (VERDICT r4 item 6): the
    scaled_10m preset AS SHIPPED (fp32 messages per the round-5 A/B —
    see configs/presets.py — with per_epoch cached propagation) on the
    planted 10M-edge graph.  Returns a dict for a
    second JSON line so BENCH_r*.json's tail records the operating point
    every round instead of round-1 SUMMARY prose.

    Definitions (stated because they differ from the headline metric):
      * value = E * 2K / propagate_s — edge traversals per second of ONE
        cached K-layer bipartite propagation (forward only: the per_epoch
        cache is under stop_gradient, so no backward SpMM exists at this
        operating point);
      * epoch_s = full jitted training epoch (propagate + 62 scanned
        cached-BPR steps + epoch-hoisted sampling).
    The headline metric instead counts fwd+bwd traversals of the
    per_batch reference-parity step at reference scale."""
    import jax
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.configs.presets import (
        get_preset)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        synthetic_bipartite_graph_planted)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import (
        RecTrainer)

    t0 = time.perf_counter()
    graph = synthetic_bipartite_graph_planted(
        500_000, 1_000_000, 20.0, seed=0, power=1.0,
        coarse_clusters=16, fine_per_coarse=16, mix=(0.55, 0.25, 0.20))
    log(f"[bench] northstar graph: {graph.summary()} "
        f"({time.perf_counter()-t0:.0f}s to build)")
    cfg = get_preset("scaled_10m", epochs=2, seed=0)
    tr = RecTrainer(cfg, graph, verbose=False)
    params, opt_state, key = tr.init_state()
    bundle = tr.train_state_bundle()
    epoch_fn = tr._build_epoch_fn()

    prop = lambda: tr._propagate_fn(params, tr.model.state)
    jax.block_until_ready(prop())          # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = prop()
    jax.block_until_ready(out)
    t_prop = (time.perf_counter() - t0) / iters

    state = [params, opt_state, key]

    def one_epoch():
        p, o, k, loss = epoch_fn(state[0], state[1], state[2],
                                 tr.train_users_dev, bundle)
        state[0], state[1], state[2] = p, o, k
        return loss
    jax.block_until_ready(one_epoch())     # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        loss = one_epoch()
    jax.block_until_ready(loss)
    t_epoch = (time.perf_counter() - t0) / iters

    E = graph.train_edges.shape[1]
    K = cfg.num_layers
    value = E * 2 * K / t_prop
    log(f"[bench] northstar scaled_10m ({cfg.spmm_precision} messages, "
        f"per_epoch): propagate {t_prop*1e3:.1f} ms "
        f"({value/1e6:.1f}M edges/s), epoch {t_epoch:.3f} s")
    return {
        "metric": "northstar_propagation_edges_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "edges/s",
        "definition": "E*2K/propagate_s, one cached K-layer bipartite "
                      "propagation, scaled_10m preset as shipped "
                      f"(spmm_precision={cfg.spmm_precision}, D="
                      f"{cfg.emb_dim}, K={K}, E={E})",
        "propagate_s": round(t_prop, 4),
        "epoch_s": round(t_epoch, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="ref", choices=["small", "ref", "large"])
    ap.add_argument("--backend", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--baseline-backend", default="xla")
    ap.add_argument("--emb-dim", type=int, default=64)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    # bf16 message-stream mode is the recommended throughput config: fp32
    # per-destination accumulation is kept and quality is measured
    # IDENTICAL to fp32 on both eval protocols (docs/PRECISION.md).  The
    # vs_baseline denominator stays stock-XLA fp32 — the reference's own
    # arithmetic.  --precision fp32 benches the parity-default mode.
    ap.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    ap.add_argument("--propagation", default="gauss_seidel",
                    choices=["gauss_seidel", "symmetric", "bipartite_sync"])
    ap.add_argument("--mode", default="epoch", choices=["epoch", "step"],
                    help="epoch: time the real RecTrainer scanned epoch "
                    "(amortized per-step; the headline). step: one isolated "
                    "jitted train step (per-batch sampling included).")
    ap.add_argument("--no-northstar", action="store_true",
                    help="skip the 10M-edge scaled_10m operating-point "
                    "measurement (second JSON line; TPU default run only)")
    args = ap.parse_args()

    import jax
    platform = jax.devices()[0].platform
    log(f"[bench] platform={platform} device={jax.devices()[0]}")
    backend = args.backend
    if platform != "tpu" and backend == "pallas":
        log("[bench] no TPU: falling back to xla backend (pallas interpret "
            "mode is not a performance path)")
        backend = "xla"

    graph = build_graph(args.scale)
    E = graph.train_edges.shape[1]
    log(f"[bench] graph: {graph.summary()}")
    # edge traversals per step: K layers x 2 directions x (fwd + bwd)
    edges_per_step = E * args.layers * 2 * 2

    if args.mode == "epoch":
        run_epoch, state, nb = make_epoch(graph, backend, args.emb_dim,
                                          args.layers, args.batch,
                                          precision=args.precision,
                                          propagation=args.propagation)
        iters = max(1, args.iters // 4)
        edt, loss = time_epoch(run_epoch, state, iters)
        dt = edt / nb
        log(f"[bench] {backend}/{args.precision}: {edt*1e3:.1f} ms/epoch "
            f"({nb} batches, {dt*1e3:.3f} ms/step) loss={loss:.4f}")
    else:
        step, params, opt_state, cfg = make_step(graph, backend, args.emb_dim,
                                                 args.layers, args.batch,
                                                 precision=args.precision,
                                                 propagation=args.propagation)
        dt, loss = time_step(step, params, opt_state, args.iters)
        log(f"[bench] {backend}/{args.precision}: {dt*1e3:.3f} ms/step "
            f"loss={loss:.4f}")
    value = edges_per_step / dt

    # speed-of-light estimate (BASELINE.json: edges/sec/chip vs roofline).
    # Each SpMM moves ~3 row-sized streams per edge (source gather, message
    # write+read) plus the destination write; v5e HBM ~819 GB/s.  The gather
    # engine is row-rate-bound at ~5.5 ns/row (measured), usually the binder.
    n_spmm = args.layers * 2 * 2          # fwd+bwd, both directions
    D = args.emb_dim
    elt = 2 if args.precision == "bf16" else 4
    bytes_per_spmm = E * D * elt * 3 + (graph.num_users + graph.num_items) * D * 4
    t_bw = n_spmm * bytes_per_spmm / 819e9
    # gather rate scales with row bytes (docs/KERNEL.md measurements)
    t_gather = n_spmm * E * 5.5e-9 * elt / 4
    sol = max(t_bw, t_gather)
    log(f"[bench] roofline: bw-bound {t_bw*1e3:.1f} ms, gather-bound "
        f"{t_gather*1e3:.1f} ms -> step efficiency {sol/dt*100:.0f}% of "
        f"speed-of-light")

    def bench_baseline(precision):
        if args.mode == "epoch":
            brun, bstate, bnb = make_epoch(graph, args.baseline_backend,
                                           args.emb_dim, args.layers,
                                           args.batch, precision=precision,
                                           propagation=args.propagation)
            bedt, bloss = time_epoch(brun, bstate, max(args.iters // 8, 2))
            return bedt / bnb, bloss
        bstep, bparams, bopt, _ = make_step(
            graph, args.baseline_backend, args.emb_dim, args.layers,
            args.batch, precision=precision, propagation=args.propagation)
        return time_step(bstep, bparams, bopt, max(args.iters // 2, 5))

    # Two ratios so the kernel win and the bf16 message-stream win are
    # never conflated (ADVICE r2): vs_baseline is against stock-XLA fp32
    # (the reference's own arithmetic — the headline), and
    # vs_baseline_same_precision re-runs the XLA baseline at --precision.
    vs_baseline = 1.0
    vs_same = None
    if backend != args.baseline_backend:
        bdt, bloss = bench_baseline("fp32")
        log(f"[bench] {args.baseline_backend}/fp32: {bdt*1e3:.3f} ms/step "
            f"loss={bloss:.4f}")
        vs_baseline = bdt / dt
        if args.precision != "fp32":
            sdt, sloss = bench_baseline(args.precision)
            log(f"[bench] {args.baseline_backend}/{args.precision}: "
                f"{sdt*1e3:.3f} ms/step loss={sloss:.4f}")
            vs_same = sdt / dt

    out = {
        "metric": "train_edges_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs_baseline, 3),
    }
    if vs_same is not None:
        out["vs_baseline_same_precision"] = round(vs_same, 3)

    # North-star operating point as a second JSON line BEFORE the headline
    # (the driver parses the LAST line; both land in the recorded tail).
    # TPU default-scale runs only: the 10M planted graph on CPU would take
    # tens of minutes for a number that isn't the CPU path's to claim.
    if (not args.no_northstar and platform == "tpu"
            and args.scale == "ref" and args.mode == "epoch"):
        try:
            print(json.dumps(bench_northstar()))
        except Exception as e:          # never sink the headline metric
            log(f"[bench] northstar measurement failed: {e!r}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
