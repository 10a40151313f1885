"""Round-4 eval fast-path re-certification on a MOVING metric surface.

VERDICT r3 weak-1/task-1: the round-3 "approx top-k metrics identical" and
"bf16 scores metrics identical" claims were collected on a synthetic graph
with no preference structure — full-catalog VAL metrics froze at epoch 3,
so ranking perturbations near the top-K boundary were invisible.  This
harness re-runs the equivalence triplet on the PLANTED-structure 10M-edge
graph (graph/build.py:synthetic_bipartite_graph_planted — two-level latent
clusters, metrics strictly improve for >=10 epochs):

  exact   — eval_topk=exact  eval_score_dtype=fp32   (parity protocol)
  approx  — eval_topk=approx eval_score_dtype=fp32
  bf16    — eval_topk=approx eval_score_dtype=bf16   (scaled_10m default)

and reports, in addition to the aggregate metric trajectories:

  * per-user top-20 SET overlap (mean Jaccard@20) of each fast mode vs the
    exact ranking ON THE SAME PARAMS — set overlap detects rank
    perturbations aggregates hide;
  * per-epoch VAL metric deltas between modes.

Usage (one TPU; ~15 min/arm at 12 epochs):
  python scripts/eval_equiv_r4.py train --mode exact
  python scripts/eval_equiv_r4.py train --mode approx
  python scripts/eval_equiv_r4.py train --mode bf16
  python scripts/eval_equiv_r4.py overlap      (uses the exact arm's params)
  python scripts/eval_equiv_r4.py report
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

DIR = Path("runs/eval_equiv_r4")
EPOCHS = 12
MODES = {
    "exact": dict(eval_topk="exact", eval_score_dtype="fp32"),
    "approx": dict(eval_topk="approx", eval_score_dtype="fp32"),
    "bf16": dict(eval_topk="approx", eval_score_dtype="bf16"),
}


def build_graph():
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        synthetic_bipartite_graph_planted)
    return synthetic_bipartite_graph_planted(
        500_000, 1_000_000, 20.0, seed=0, power=1.0,
        coarse_clusters=16, fine_per_coarse=16, mix=(0.55, 0.25, 0.20))


def make_cfg(mode: str):
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.configs.presets import (
        get_preset)
    return get_preset("scaled_10m", epochs=EPOCHS, seed=0, **MODES[mode])


def cmd_train(args):
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.checkpoint import (
        save_params_npz)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.trainer import (
        RecTrainer)
    DIR.mkdir(parents=True, exist_ok=True)
    graph = build_graph()
    print(f"graph: {graph.summary()}", flush=True)
    cfg = make_cfg(args.mode)
    t0 = time.time()
    tr = RecTrainer(cfg, graph, verbose=True)
    fit = tr.fit()
    wall = time.time() - t0
    rec = {
        "mode": args.mode, "epochs": EPOCHS, "wall_seconds": wall,
        "history": [{"epoch": h.epoch, "loss": h.loss,
                     "val": {str(K): {k: float(v) for k, v in r.items()
                                      if isinstance(v, (int, float))}
                             for K, r in (h.val or {}).items()}}
                    for h in fit.history],
        "best_val_recall": float(fit.best_val_recall),
        "test": {str(K): {k: float(v) for k, v in r.items()
                          if isinstance(v, (int, float))}
                 for K, r in fit.test_metrics.items()},
    }
    (DIR / f"train_{args.mode}.json").write_text(json.dumps(rec, indent=2))
    save_params_npz(DIR / f"params_{args.mode}.npz", fit.best_params)
    print(f"[{args.mode}] wall={wall:.1f}s "
          f"testR@20={rec['test']['20']['recall']:.4f}", flush=True)


def _topk_lists(user_emb, item_emb, ctx, users, mode, K=20, batch=512):
    """(n_users, K) top-K item lists under one eval mode's ranking path —
    the same _full_batch kernel evaluate_full runs."""
    import jax.numpy as jnp
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.eval.ranking import (
        _full_batch, _batched)
    kw = MODES[mode]
    out = []
    for bu, bu_host, n_valid in _batched(users, batch):
        excl = jnp.asarray(ctx.train_exclusion_rows(bu_host))
        _, topk_items, _, _ = _full_batch(
            user_emb, item_emb, bu, excl, ctx.split_csr("val"),
            ctx.item_pop_dev, (K,), False, ctx.total_train,
            ctx.graph.num_items, topk=kw["eval_topk"],
            score_dtype=kw["eval_score_dtype"])
        out.append(np.asarray(topk_items)[:n_valid, :K])
    return np.concatenate(out, axis=0)


def cmd_overlap(args):
    """Mean Jaccard@20 of each fast mode vs exact, SAME params."""
    import jax
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.eval.ranking import (
        EvalContext)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.models.lightgcn import (
        LightGCN)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.train.checkpoint import (
        load_params_npz)
    graph = build_graph()
    cfg = make_cfg("exact")
    model = LightGCN(cfg, graph, None)
    params = load_params_npz(DIR / "params_exact.npz")
    ctx = EvalContext.build(graph, membership=cfg.membership)
    user_emb, item_emb = jax.jit(
        lambda p, s: model.propagate(p, s))(params, model.state)
    users = ctx.eval_users["val"]
    if args.max_users and users.size > args.max_users:
        users = users[np.linspace(0, users.size - 1, args.max_users,
                                  dtype=np.int64)]
    print(f"overlap over {users.size:,} val users", flush=True)
    lists = {m: _topk_lists(user_emb, item_emb, ctx, users, m)
             for m in MODES}
    res = {"n_users": int(users.size), "K": 20}
    for m in ("approx", "bf16"):
        inter = np.array([np.intersect1d(a, b).size
                          for a, b in zip(lists["exact"], lists[m])])
        jac = inter / (40 - inter)          # |A|=|B|=20 -> |union|=40-|∩|
        res[f"jaccard_{m}_vs_exact"] = {
            "mean": float(jac.mean()), "p05": float(np.percentile(jac, 5)),
            "min": float(jac.min()),
            "frac_identical": float((inter == 20).mean()),
        }
        print(m, res[f"jaccard_{m}_vs_exact"], flush=True)
    (DIR / "overlap.json").write_text(json.dumps(res, indent=2))


def cmd_report(args):
    recs = {m: json.loads((DIR / f"train_{m}.json").read_text())
            for m in MODES if (DIR / f"train_{m}.json").exists()}
    overlap = (json.loads((DIR / "overlap.json").read_text())
               if (DIR / "overlap.json").exists() else None)
    lines = ["## Eval fast-path equivalence on the planted-structure "
             "10M graph (round 4)", ""]
    if "exact" in recs:
        rs = [h["val"]["20"]["recall"] for h in recs["exact"]["history"]
              if h["val"]]
        improving = int((np.diff(rs) > 0).sum())
        lines += [f"Planted graph: VAL R@20 moves every epoch "
                  f"({improving}/{len(rs)-1} strict improvements over "
                  f"{len(rs)} epochs: "
                  + " ".join(f"{r:.4f}" for r in rs) + ")", ""]
    lines += ["| arm | wall (12 ep) | best val R@20 | TEST R@20 | "
              "TEST NDCG@20 |", "|---|---|---|---|---|"]
    for m, r in recs.items():
        lines.append(f"| {m} | {r['wall_seconds']:.1f}s | "
                     f"{r['best_val_recall']:.4f} | "
                     f"{r['test']['20']['recall']:.4f} | "
                     f"{r['test']['20']['ndcg']:.4f} |")
    if overlap:
        lines += ["", "Per-user top-20 SET overlap vs exact (same params):",
                  ""]
        for m in ("approx", "bf16"):
            o = overlap.get(f"jaccard_{m}_vs_exact")
            if o:
                lines.append(f"* {m}: mean Jaccard@20 = {o['mean']:.4f} "
                             f"(p05 {o['p05']:.4f}, min {o['min']:.4f}; "
                             f"{o['frac_identical']:.1%} of users have "
                             f"identical top-20 sets)")
    out = DIR / "report.md"
    out.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("train")
    t.add_argument("--mode", required=True, choices=list(MODES))
    t.set_defaults(fn=cmd_train)
    o = sub.add_parser("overlap")
    o.add_argument("--max-users", type=int, default=100_000)
    o.set_defaults(fn=cmd_overlap)
    r = sub.add_parser("report")
    r.set_defaults(fn=cmd_report)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
