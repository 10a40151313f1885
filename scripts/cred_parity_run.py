"""Stage-A quality-parity harness (VERDICT r3 item 2).

Compares THREE Stage-A trainers on one planted-signal heterograph:
  oracle      — scripts/cred_oracle.py (reference semantics: Python SLAS
                2-hop subgraphs, torch CPU)
  full_graph  — framework CredTrainer default (full-graph temporal-view
                segment-sums; the deliberate TPU redesign)
  slas        — framework CredTrainer trainer_mode="slas" (fixed-shape
                on-device Gumbel-top-k SLAS)

Comparisons:
  1. cred-score distributions: percentiles + Spearman rank correlation
     between each pair AND against the planted latent quality q;
  2. downstream Stage-B deltas: cu_message and cred_eq322 trained on the
     SAME aligned bipartite graph with each cred vector (plus all-ones
     control), test R@20/NDCG@20.

Usage:
  python scripts/cred_parity_run.py build
  python scripts/cred_parity_run.py oracle        (long: torch-CPU loops)
  python scripts/cred_parity_run.py framework --mode full_graph
  python scripts/cred_parity_run.py framework --mode slas
  python scripts/cred_parity_run.py downstream
  python scripts/cred_parity_run.py report
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DIR = Path("runs/cred_parity")
EPOCHS_A = 60          # Stage-A epochs (reference default 100; signal
                       # saturates well before that at this scale)
EPOCHS_B = 120         # Stage-B epochs for the downstream delta


def build_planted_heterograph(U=3000, I=6000, deg=10.0, seed=7):
    """Heterograph with PLANTED user quality q: labels, two informative
    user features, and the 'verified' edge attr all correlate with q, so
    every trainer has real signal to recover and rank correlations are
    meaningful (random labels would make the comparison noise-vs-noise)."""
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.hetero import (
        CRED_GRAPH_FEATURE_KEYS, HeteroGraph)
    rng = np.random.default_rng(seed)
    q = rng.uniform(0, 1, U)
    user_y = np.full(U, -1, np.int64)
    user_y[q > 0.62] = 1
    user_y[q < 0.38] = 0
    # 7 features: 2 informative (q + noise), 5 nuisance
    user_x = rng.normal(size=(U, 7)).astype(np.float32)
    user_x[:, 0] = q + rng.normal(0, 0.25, U)
    user_x[:, 1] = (1 - q) + rng.normal(0, 0.35, U)

    E = int(U * deg)
    u = rng.integers(0, U, E)
    p = 1.0 / np.arange(1, I + 1, dtype=np.float64)
    p /= p.sum()
    i = rng.choice(I, size=E, p=p)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    u, i = pairs[:, 0].astype(np.int32), pairs[:, 1].astype(np.int32)
    E = u.size

    rating = rng.integers(1, 6, E).astype(np.float32)
    mean_r = np.zeros(I)
    cnt = np.maximum(np.bincount(i, minlength=I), 1)
    np.add.at(mean_r, i, rating)
    mean_r = mean_r / cnt
    ts = rng.random(E).astype(np.float32)
    ts[rng.random(E) < 0.05] = np.nan
    verified = (rng.random(E) < (0.25 + 0.55 * q[u])).astype(np.float32)
    attr = np.stack([
        verified,
        1.0 - np.abs(rating - mean_r[i]) / 4.0,
        rating, ts,
        rng.integers(0, 12, E).astype(np.float32)], 1).astype(np.float32)
    hg = HeteroGraph(
        user_x=user_x, user_y=user_y,
        item_x=np.stack([mean_r, cnt], 1).astype(np.float32),
        edges=np.stack([u, i]), edge_attr=attr,
        feature_keys=list(CRED_GRAPH_FEATURE_KEYS),
        user_ids=[f"u{k}" for k in range(U)])
    return hg, q, (u, i)


def cmd_build(args):
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        BipartiteGraph)
    DIR.mkdir(parents=True, exist_ok=True)
    hg, q, (u, i) = build_planted_heterograph(seed=args.seed)
    hg.save_npz(DIR / "hg.npz")
    np.save(DIR / "latent_q.npy", q)
    # aligned Stage-B graph from the SAME edges, md5 content-hash split
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.data.ingest import (
        md5_split_bucket)
    buckets = np.array([md5_split_bucket(f"u{a}", f"i{b}")
                        for a, b in zip(u, i)], np.int8)

    def edges_of(b):
        m = buckets == b
        return np.stack([u[m], i[m]]).astype(np.int32)
    g = BipartiteGraph(num_users=hg.num_users, num_items=hg.num_items,
                       train_edges=edges_of(0), val_edges=edges_of(1),
                       test_edges=edges_of(2))
    np.savez_compressed(DIR / "graph.npz", train_edges=g.train_edges,
                        val_edges=g.val_edges, test_edges=g.test_edges,
                        num_users=g.num_users, num_items=g.num_items)
    print(f"built: {hg.num_users} users / {hg.num_items} items / "
          f"{hg.num_edges} edges -> {DIR}")


def cmd_oracle(args):
    import subprocess
    cmd = [sys.executable, "scripts/cred_oracle.py", "--hg",
           str(DIR / "hg.npz"), "--out", str(DIR / "cred_oracle.npy"),
           "--epochs", str(EPOCHS_A), "--batch-size", "1024",
           "--seed", str(args.seed)]
    subprocess.run(cmd, check=True)


def cmd_framework(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.hetero import (
        HeteroGraph)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.cred_trainer import (
        CredTrainer)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (
        CredConfig)
    hg = HeteroGraph.load_npz(DIR / "hg.npz")
    cfg = CredConfig(trainer_mode=args.mode, epochs=EPOCHS_A,
                     batch_size=1024, seed=args.seed)
    tr = CredTrainer(hg, cfg, verbose=True)
    res = tr.fit()
    np.save(DIR / f"cred_{args.mode}.npy", res.cred_minmax)
    print(f"saved {DIR}/cred_{args.mode}.npy "
          f"(final holdout AUC={res.history[-1]['holdout_auc']:.4f})")


def cmd_downstream(args):
    """Stage-B deltas: each cred source feeds cu_message + cred_eq322."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        BipartiteGraph)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import (
        RecTrainer)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (
        RecConfig)
    z = np.load(DIR / "graph.npz")
    graph = BipartiteGraph(num_users=int(z["num_users"]),
                           num_items=int(z["num_items"]),
                           train_edges=z["train_edges"],
                           val_edges=z["val_edges"],
                           test_edges=z["test_edges"])
    sources = {"ones": np.ones(graph.num_users, np.float32)}
    for name in ("oracle", "full_graph", "slas"):
        p = DIR / f"cred_{name}.npy"
        if p.exists():
            sources[name] = np.load(p).astype(np.float32)
    cfgs = {
        "cu_message": dict(propagation="gauss_seidel",
                           weight_mode="cu_message"),
        "cred_eq322": dict(propagation="bipartite_sync",
                           weight_mode="cred_eq322"),
    }
    out = {}
    for cname, cdict in cfgs.items():
        for sname, cred in sources.items():
            cfg = RecConfig(name=f"ds_{cname}_{sname}", table_layout="split",
                            epochs=EPOCHS_B, eval_every=4, seed=args.seed,
                            **cdict)
            fit = RecTrainer(cfg, graph, cred=cred, verbose=False).fit()
            m = fit.test_metrics[20]
            out[f"{cname}/{sname}"] = {"recall": float(m["recall"]),
                                       "ndcg": float(m["ndcg"])}
            print(f"{cname}/{sname}: R@20={m['recall']:.4f} "
                  f"NDCG@20={m['ndcg']:.4f}", flush=True)
    with open(DIR / "downstream.json", "w") as f:
        json.dump(out, f, indent=2)


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra**2).sum() * (rb**2).sum()))


def cmd_report(args):
    q = np.load(DIR / "latent_q.npy")
    creds = {}
    for name in ("oracle", "full_graph", "slas"):
        p = DIR / f"cred_{name}.npy"
        if p.exists():
            creds[name] = np.load(p)
    lines = ["## Stage-A parity: SLAS-subgraph oracle vs framework trainers",
             "",
             "Planted-signal heterograph (latent user quality q drives "
             "labels, 2 of 7 features, and the verified edge attr; "
             f"`{DIR}/hg.npz`).  Oracle = `scripts/cred_oracle.py`, the "
             "reference's Python-SLAS 2-hop training semantics "
             "(/root/reference/main.py:609-1025) on torch CPU.",
             "",
             "### Cred-score distributions",
             "",
             "| trainer | p10 | p50 | p90 | p99 | rho vs q | rho vs oracle |",
             "|---|---|---|---|---|---|---|"]
    for name, c in creds.items():
        p = np.percentile(c, [10, 50, 90, 99])
        r_q = spearman(c, q)
        r_o = spearman(c, creds["oracle"]) if "oracle" in creds else \
            float("nan")
        lines.append(f"| {name} | {p[0]:.4f} | {p[1]:.4f} | {p[2]:.4f} | "
                     f"{p[3]:.4f} | {r_q:.4f} | {r_o:.4f} |")
    ds = {}
    if (DIR / "downstream.json").exists():
        ds = json.loads((DIR / "downstream.json").read_text())
        lines += ["", "### Downstream Stage-B deltas (test, K=20)", "",
                  "| config / cred source | R@20 | NDCG@20 |", "|---|---|---|"]
        for k, v in ds.items():
            lines.append(f"| {k} | {v['recall']:.4f} | {v['ndcg']:.4f} |")

    # verdict: the redesign is ACCEPTED if the framework trainers track the
    # oracle's ranking (rho >= 0.8), the DEFAULT mode (slas) also matches
    # the oracle's score DISTRIBUTION (|Δ percentile| <= 0.10 at
    # p10/p50/p90 — rank correlation alone hides compression, VERDICT r3
    # weak-7), and every downstream delta vs the oracle-cred run is small
    # relative to the ones-vs-cred effect.
    verdict = []
    pct_verdict = None
    if "oracle" in creds:
        for name in ("full_graph", "slas"):
            if name in creds:
                rho = spearman(creds[name], creds["oracle"])
                verdict.append((name, rho))
        if "slas" in creds:
            po = np.percentile(creds["oracle"], [10, 50, 90])
            ps = np.percentile(creds["slas"], [10, 50, 90])
            pct_verdict = np.abs(ps - po)
    ok = all(r >= 0.8 for _, r in verdict) if verdict else False
    if pct_verdict is not None:
        ok = ok and bool((pct_verdict <= 0.10).all())
    ds_note = ""
    if ds:
        deltas = []
        for cname in ("cu_message", "cred_eq322"):
            o = ds.get(f"{cname}/oracle")
            for name in ("full_graph", "slas"):
                f = ds.get(f"{cname}/{name}")
                if o and f:
                    deltas.append(abs(f["recall"] - o["recall"]))
        if deltas:
            ds_note = (f" Max downstream |R@20 delta| vs oracle-cred: "
                       f"{max(deltas):.4f}.")
    pct_note = ""
    if pct_verdict is not None:
        pct_note = (" Default-mode (slas) |Δ percentile| vs oracle at "
                    "p10/p50/p90: "
                    + "/".join(f"{d:.3f}" for d in pct_verdict)
                    + " (threshold 0.10 each).")
    lines += ["", f"**Verdict: {'ACCEPT' if ok else 'FLAG'}** — framework "
              "trainers' rank correlation vs the SLAS-subgraph oracle: "
              + ", ".join(f"{n}={r:.3f}" for n, r in verdict)
              + f" (threshold 0.8).{pct_note}{ds_note}", ""]
    out = Path(args.out)
    out.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in (("build", cmd_build), ("oracle", cmd_oracle),
                     ("framework", cmd_framework),
                     ("downstream", cmd_downstream), ("report", cmd_report)):
        p = sub.add_parser(name)
        p.add_argument("--seed", type=int, default=42)
        if name == "framework":
            p.add_argument("--mode", required=True,
                           choices=["full_graph", "slas"])
        if name == "report":
            p.add_argument("--out", default="runs/cred_parity/stage_a.md")
        p.set_defaults(fn=fn)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
