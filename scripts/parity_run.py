"""Quality-parity harness: framework vs reference-oracle on a shared graph.

Usage:
  python scripts/parity_run.py build --out runs/parity/graph.npz
  python scripts/parity_run.py framework --graph ... --config vanilla --seed 0
  python scripts/parity_run.py report --dir runs/parity

The oracle side is scripts/parity_oracle.py (torch CPU, reference
semantics).  Both sides train on the SAME synthetic graph + md5 splits,
same protocol (epochs, eval cadence, sampled 1+99 eval, best-on-val-R@20),
and are compared as mean +/- std over seeds in docs/PARITY.md.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIG_MAP = {
    # parity preset fields for the framework side (all reference-protocol)
    "vanilla": dict(propagation="symmetric", weight_mode="symmetric",
                    table_layout="joint", negative_sampler="uniform"),
    "cu_message": dict(propagation="gauss_seidel", weight_mode="cu_message",
                       table_layout="split", negative_sampler="uniform"),
    "pop_neg": dict(propagation="gauss_seidel", weight_mode="cu_message",
                    table_layout="split", negative_sampler="popmix"),
    # round-3 additions (VERDICT item 1)
    "cred_eq322": dict(propagation="bipartite_sync",
                       weight_mode="cred_eq322", table_layout="split",
                       negative_sampler="uniform", lambda_fair=0.0),
    "cred_eq322_fair": dict(propagation="bipartite_sync",
                            weight_mode="cred_eq322", table_layout="split",
                            negative_sampler="uniform", lambda_fair=1e-2),
    "degree_aware": dict(propagation="gauss_seidel",
                         weight_mode="degree_aware", table_layout="split",
                         negative_sampler="uniform"),
    "pop_extended": dict(propagation="gauss_seidel",
                         weight_mode="cu_message", table_layout="split",
                         negative_sampler="popmix", extended_metrics=True,
                         cred_group_pct=0.20),
}
# configs that consume the shared real-like cred vector (vs all-ones)
REAL_CRED = {"cred_eq322", "cred_eq322_fair"}
EXT_METRICS = ("item_coverage", "avg_log_popularity",
               "avg_self_information", "cred_utility",
               "high_cred_recall", "low_cred_recall")


def cmd_build(args):
    import numpy as np
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        synthetic_bipartite_graph)
    g = synthetic_bipartite_graph(num_users=args.users, num_items=args.items,
                                  edges_per_user=args.edges_per_user,
                                  seed=args.seed, power=1.0,
                                  hash_split="md5")
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, train_edges=g.train_edges,
                        val_edges=g.val_edges, test_edges=g.test_edges,
                        num_users=g.num_users, num_items=g.num_items)
    print(f"graph: {g.summary()} -> {out}")
    # Shared real-like low-variance cred vector for the cred_eq322 runs:
    # lognormal matched to the reference's real scores (p50=0.065,
    # p90=0.128, version_1/lightgcn_cu_fair.out / SURVEY.md paragraph 6),
    # clipped to [0,1].  Both oracle and framework load this same file.
    rng = np.random.default_rng(args.seed + 101)
    sigma = float(np.log(0.128 / 0.065) / 1.2816)  # p90/p50 ratio
    cred = np.clip(rng.lognormal(np.log(0.065), sigma, g.num_users), 0.0, 1.0)
    cred_path = out.parent / "cred.npy"
    np.save(cred_path, cred.astype(np.float32))
    q = np.percentile(cred, [50, 90])
    print(f"cred: p50={q[0]:.4f} p90={q[1]:.4f} -> {cred_path}")


def cmd_framework(args):
    import numpy as np
    import jax
    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        BipartiteGraph)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import (
        RecTrainer)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.utils.config import (
        RecConfig)

    z = np.load(args.graph)
    graph = BipartiteGraph(num_users=int(z["num_users"]),
                           num_items=int(z["num_items"]),
                           train_edges=z["train_edges"],
                           val_edges=z["val_edges"],
                           test_edges=z["test_edges"])
    fast_kw = {}
    if args.fast:
        # the full throughput-flag stack head-to-head against the torch
        # oracle (VERDICT r4 task 2): bf16 message stream + cached
        # per-epoch propagation + approx/bf16 full-catalog eval.  bf16
        # messages are deliberately kept here even though scaled_10m
        # ships fp32 messages (round-5 A/B, docs/SCALING.md): this column
        # certifies the MOST aggressive stack, and any shipped subset of
        # it is strictly closer to the exact oracle.
        # The oracle side must run --eval-mode full for the same protocol.
        fast_kw = dict(spmm_precision="bf16",
                       propagation_schedule="per_epoch",
                       eval_mode="full", eval_topk="approx",
                       eval_score_dtype="bf16")
    if args.eval_mode:
        fast_kw["eval_mode"] = args.eval_mode
    cfg = RecConfig(name=f"parity_{args.config}",
                    epochs=args.epochs, eval_every=args.eval_every,
                    seed=args.seed, **CONFIG_MAP[args.config], **fast_kw)
    cred = None
    if args.config in REAL_CRED:
        cred_path = args.cred or str(Path(args.graph).parent / "cred.npy")
        cred = np.load(cred_path).astype(np.float32)
    t0 = time.time()
    trainer = RecTrainer(cfg, graph, cred=cred, verbose=args.verbose)
    fit = trainer.fit(epochs=args.epochs, seed=args.seed)
    test = {K: {k: float(v[k]) for k in v
                if isinstance(v[k], (int, float))}
            for K, v in fit.test_metrics.items()}
    res = {"config": args.config, "seed": args.seed,
           "best_val": float(fit.best_val_recall), "test": test,
           "fast": bool(args.fast), "eval_mode": cfg.eval_mode,
           "seconds": time.time() - t0}
    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


def _load_jsonl(path):
    rows = []
    if Path(path).exists():
        for ln in Path(path).read_text().splitlines():
            if ln.strip():
                rows.append(json.loads(ln))
    return rows


def _agg(rows, config, key_k="20", metric="recall"):
    vals = [r["test"][key_k][metric] if key_k in r["test"]
            else r["test"][int(key_k)][metric]
            for r in rows if r["config"] == config]
    if not vals:
        return None
    mean = statistics.fmean(vals)
    std = statistics.stdev(vals) if len(vals) > 1 else 0.0
    return mean, std, len(vals)


def cmd_report(args):
    d = Path(args.dir)
    oracle = _load_jsonl(d / "oracle.jsonl")
    frame = _load_jsonl(d / "framework.jsonl")

    lines = [
        "# Quality parity: framework vs reference-oracle",
        "",
        "Shared synthetic graph + md5 splits "
        f"(`{args.dir}/graph.npz`); identical protocol on both sides "
        "(sampled 1+99 eval, best-on-val-Recall@20 selection, "
        "reference hyperparameters).  Oracle = `scripts/parity_oracle.py`, "
        "a fresh torch-CPU implementation of the reference training-loop "
        "semantics (/root/reference/lightgcn.py:515-632, "
        "version_1/lightgcn_cu_message.py:391-452, "
        "version_1/lightgcn_cu_pop_method-e.py:336-359).  PASS = |mean "
        "difference| <= tol, tol = max(2x pooled cross-seed std, 0.01 "
        "absolute, 1% of the oracle mean).  The 0.01 absolute floor is "
        "justified for THIS table only: sampled 1+99 evaluation is "
        "high-variance by design (SURVEY.md paragraph 6) and 0.01 is well "
        "inside its seed-to-seed spread.  The full-catalog fast-mode table "
        "below deliberately drops that floor.",
        "",
        "| Config | Metric | Oracle (mean +/- std, n) | Framework (mean +/- std, n) | diff | tol | verdict |",
        "|---|---|---|---|---|---|---|",
    ]
    worst = []
    for config in ("vanilla", "cu_message", "pop_neg", "cred_eq322",
                   "cred_eq322_fair", "degree_aware", "pop_extended"):
        metrics = ["recall", "ndcg"]
        if config == "pop_extended":
            metrics += list(EXT_METRICS)
        for metric in metrics:
            o = _agg(oracle, config, metric=metric)
            f = _agg(frame, config, metric=metric)
            if o is None or f is None:
                lines.append(f"| {config} | {metric}@20 | "
                             f"{'missing' if o is None else ''} | "
                             f"{'missing' if f is None else ''} | | | PENDING |")
                continue
            diff = f[0] - o[0]
            pooled = (o[1] ** 2 + f[1] ** 2) ** 0.5
            # Sampled-protocol tolerance: 2x pooled std with a 0.01
            # absolute floor (defended above — sampled 1+99 eval only) and
            # a 1%-relative floor for metrics on other scales
            # (avg_self_information ~17.7, avg_log_popularity ~1.1).
            tol = max(2 * pooled, 0.01, 0.01 * abs(o[0]))
            verdict = "PASS" if abs(diff) <= tol else "FAIL"
            worst.append((config, metric, diff, tol, verdict))
            lines.append(
                f"| {config} | {metric}@20 | {o[0]:.4f} +/- {o[1]:.4f} "
                f"(n={o[2]}) | {f[0]:.4f} +/- {f[1]:.4f} (n={f[2]}) | "
                f"{diff:+.4f} | {tol:.4f} | {verdict} |")
    # The reference's own finding: real low-variance cred UNDERPERFORMS
    # all-ones (lightgcn_cu_fair.out R@20=0.2227 vs vanilla 0.3099).
    # Check both sides reproduce that ordering on the shared graph.
    for side, rows in (("oracle", oracle), ("framework", frame)):
        van = _agg(rows, "vanilla")
        eq = _agg(rows, "cred_eq322")
        if van and eq:
            ok = eq[0] < van[0]
            lines += ["", f"Real-cred ordering ({side}): cred_eq322 "
                      f"R@20={eq[0]:.4f} vs vanilla {van[0]:.4f} -> "
                      f"{'REPRODUCED (real cred underperforms)' if ok else 'NOT reproduced'}"]
    lines += ["", "Raw run records: `runs/parity/oracle.jsonl`, "
              "`runs/parity/framework.jsonl`."]

    # Fast-mode column (VERDICT r4 task 2): the RECOMMENDED throughput
    # configuration — bf16 messages + per_epoch propagation + approx/bf16
    # full-catalog eval — head-to-head against the SAME torch oracle run
    # under the full-catalog protocol (both sides select on full val R@20).
    oracle_full = _load_jsonl(d / "oracle_full.jsonl")
    frame_fast = _load_jsonl(d / "framework_fast.jsonl")
    if oracle_full and frame_fast:
        lines += [
            "", "## Fast-mode parity (bf16 + per_epoch + approx/bf16 "
            "full eval vs exact-fp32 oracle)", "",
            "Same shared graph; protocol = FULL-CATALOG masked ranking on "
            "both sides (`parity_oracle.py --eval-mode full` / "
            "`parity_run.py framework --fast --platform tpu`).  The "
            "framework side runs the full throughput-flag stack: "
            "`spmm_precision=bf16 propagation_schedule=per_epoch "
            "eval_topk=approx eval_score_dtype=bf16`.  (This certifies "
            "the MOST aggressive stack; the shipped scaled_10m preset "
            "keeps per_epoch + approx/bf16 eval but ships fp32 messages "
            "after the round-5 10M A/B found bf16 messages no faster at "
            "D=128 — docs/SCALING.md.  An fp32-message fast run is "
            "strictly closer to the exact oracle than this column.)",
            "",
            "Tolerance rule (full-catalog eval is low-variance, so the "
            "sampled table's 0.01 absolute floor does NOT apply here): "
            "tol = max(2x pooled cross-seed std, 1% of the oracle mean).  "
            "**Measured systematic cost of the throughput flags:** the "
            "fast arm sits ~0.002 BELOW the exact oracle on R@20 for "
            "vanilla and pop_neg (~0.6% relative; cu_message is within "
            "noise) — a real, stated bias of the bf16/per_epoch/approx "
            "stack, accepted under the 1%-relative criterion rather than "
            "laundered through an absolute floor (VERDICT r4 item 2).",
            "",
            "| Config | Metric | Oracle full/exact (mean +/- std, n) | "
            "Framework fast (mean +/- std, n) | diff | tol(max(2x pooled "
            "std, 1% rel)) | verdict |",
            "|---|---|---|---|---|---|---|",
        ]
        for config in ("vanilla", "cu_message", "pop_neg"):
            for metric in ("recall", "ndcg"):
                o = _agg(oracle_full, config, metric=metric)
                f = _agg(frame_fast, config, metric=metric)
                if o is None or f is None:
                    lines.append(f"| {config} | {metric}@20 | | | | | "
                                 "PENDING |")
                    continue
                diff = f[0] - o[0]
                pooled = (o[1] ** 2 + f[1] ** 2) ** 0.5
                # full-catalog rows: NO absolute floor (VERDICT r4 item 2)
                tol = max(2 * pooled, 0.01 * abs(o[0]))
                verdict = "PASS" if abs(diff) <= tol else "FAIL"
                lines.append(
                    f"| {config} | {metric}@20 | {o[0]:.4f} +/- {o[1]:.4f} "
                    f"(n={o[2]}) | {f[0]:.4f} +/- {f[1]:.4f} (n={f[2]}) | "
                    f"{diff:+.4f} | {tol:.4f} | {verdict} |")
        lines += ["", "Raw fast-mode records: `runs/parity/"
                  "oracle_full.jsonl`, `runs/parity/framework_fast.jsonl`.",
                  "", "NOTE: the `scaled_10m` preset's eval is APPROXIMATE "
                  "BY DEFAULT (`eval_topk=approx eval_score_dtype=bf16`); "
                  "parity/oracle runs must override `eval_topk=exact "
                  "eval_score_dtype=fp32`.  All parity-mode rows above ran "
                  "the exact defaults."]
    stage_a = Path("runs/cred_parity/stage_a.md")
    if stage_a.exists():
        lines += ["", stage_a.read_text().rstrip(),
                  "", "Raw Stage-A artifacts: `runs/cred_parity/` "
                  "(scripts/cred_parity_run.py)."]
    out = Path(args.report_out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--out", default="runs/parity/graph.npz")
    b.add_argument("--users", type=int, default=8000)
    b.add_argument("--items", type=int, default=24000)
    b.add_argument("--edges-per-user", type=float, default=8.0)
    b.add_argument("--seed", type=int, default=7)
    b.set_defaults(fn=cmd_build)

    f = sub.add_parser("framework")
    f.add_argument("--graph", required=True)
    f.add_argument("--config", required=True, choices=list(CONFIG_MAP))
    f.add_argument("--cred", default=None)
    f.add_argument("--seed", type=int, required=True)
    f.add_argument("--epochs", type=int, default=200)
    f.add_argument("--eval-every", type=int, default=2)
    f.add_argument("--out", default=None)
    f.add_argument("--verbose", action="store_true")
    f.add_argument("--fast", action="store_true",
                   help="recommended throughput flags: bf16 messages + "
                        "per_epoch propagation + approx/bf16 full eval")
    f.add_argument("--eval-mode", default=None,
                   choices=[None, "sampled", "full"])
    f.add_argument("--platform", default="cpu",
                   choices=["cpu", "tpu", "default"],
                   help="tpu required for --fast (bf16 message kernels "
                        "are pallas-only)")
    f.set_defaults(fn=cmd_framework)

    r = sub.add_parser("report")
    r.add_argument("--dir", default="runs/parity")
    r.add_argument("--report-out", default="docs/QUALITY_PARITY.md")
    r.set_defaults(fn=cmd_report)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
