"""Command-line interface.

The reference's "CLI" is editing module constants and running each script
(`if __name__ == "__main__": main()`, SURVEY.md §1).  Here every stage is a
subcommand with config overrides:

    python -m beyond_binary_..._tpu.cli build-graph --jsonl R.jsonl --out D/
    python -m ..._tpu.cli train-cred  --jsonl R.jsonl --out D/ [k=v ...]
    python -m ..._tpu.cli train-rec   --graph D/graph.npz --preset cu_message
                                      [--cred D/cred.csv] [k=v ...]
    python -m ..._tpu.cli evaluate    --graph D/graph.npz --params best.npz
                                      --preset cu_message [k=v ...]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def _add_overrides(p):
    p.add_argument("overrides", nargs="*",
                   help="config overrides as key=value")


def _make_mesh(spec):
    """--mesh 'all' or a device count -> (data, model) Mesh, else None."""
    if not spec:
        return None
    import jax
    from ..parallel.mesh import make_mesh
    n = len(jax.devices()) if spec == "all" else int(spec)
    mesh = make_mesh(n)
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
    return mesh


def cmd_build_graph(args):
    from ..data.ingest import ingest_jsonl
    from ..graph.build import build_bipartite_graph
    from ..utils.config import IngestConfig

    cfg = IngestConfig(jsonl_path=args.jsonl).with_overrides(args.overrides)
    table = ingest_jsonl(args.jsonl, cfg)
    graph = build_bipartite_graph(table)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    graph.save_npz(out / "graph.npz")
    print(f"Saved graph to {out/'graph.npz'}")
    print(graph.summary())


def cmd_train_cred(args):
    from ..data.features import (compute_user_features, save_features_csv,
                                 save_labels_csv)
    from ..data.ingest import ingest_jsonl
    from ..graph.hetero import build_heterograph
    from ..train.checkpoint import TrainCheckpointer
    from ..train.cred_trainer import CredTrainer
    from ..utils.config import CredConfig, IngestConfig

    ccfg = CredConfig().with_overrides(args.overrides)
    table = ingest_jsonl(args.jsonl, IngestConfig(jsonl_path=args.jsonl),
                         collect_token_hashes=(ccfg.feature_set == "v1"))
    feats = compute_user_features(table, ccfg)
    hg = build_heterograph(table, feats,
                           graph_feature_set=ccfg.graph_feature_set)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    # reference intermediate artifacts (main.py steps 1/3)
    save_labels_csv(out / "user_labels.csv", table, feats.labels)
    save_features_csv(out / "user_features.csv", table, feats)
    hg.save_npz(out / "graph_hetero.npz")
    if args.plots:
        from ..eval.report import plot_feature_distributions
        plot_feature_distributions(feats, out / "plots")
    mesh = _make_mesh(args.mesh)
    trainer = CredTrainer(hg, ccfg, mesh=mesh)
    ck = TrainCheckpointer(out / "cred_ckpt", keep=args.ckpt_keep,
                           every=args.ckpt_every) if args.checkpoint else None
    result = trainer.fit(checkpointer=ck, resume=args.resume)
    trainer.export(result, out)


def cmd_train_rec(args):
    from ..configs.presets import get_preset
    from ..graph.build import BipartiteGraph
    from ..train.checkpoint import TrainCheckpointer, save_params_npz
    from ..train.trainer import RecTrainer, format_metrics_block

    cfg = get_preset(args.preset).with_overrides(args.overrides)
    if args.cred:
        cfg = cfg.replace(cred_csv_path=args.cred)
    if args.out:
        cfg = cfg.replace(out_dir=args.out)
    graph = BipartiteGraph.load_npz(args.graph)
    print(f"Loaded edges. {graph.summary()}")
    trainer = RecTrainer(cfg, graph, mesh=_make_mesh(args.mesh))
    ck = TrainCheckpointer(Path(args.out) / "ckpt",
                           keep=args.ckpt_keep, every=args.ckpt_every) if (
        args.out and args.checkpoint) else None
    result = trainer.fit(checkpointer=ck, resume=args.resume)
    if args.out:
        save_params_npz(Path(args.out) / "best_model.npz", result.best_params)
        with open(Path(args.out) / "test_metrics.json", "w") as f:
            json.dump({str(k): v for k, v in result.test_metrics.items()}, f,
                      indent=2, default=float)


def cmd_merge_user_ids(args):
    import numpy as np
    from ..data.cred_io import save_credibility_csv
    from ..graph.build import BipartiteGraph

    graph = BipartiteGraph.load_npz(args.graph)
    cred = np.load(args.npy)
    save_credibility_csv(args.out, cred, graph.user_ids)
    print(f"Saved {args.out} ({len(cred)} users)")


def cmd_evaluate(args):
    from ..configs.presets import get_preset
    from ..graph.build import BipartiteGraph
    from ..train.checkpoint import load_params_npz
    from ..train.trainer import RecTrainer, format_metrics_block

    cfg = get_preset(args.preset).with_overrides(args.overrides)
    if args.cred:
        cfg = cfg.replace(cred_csv_path=args.cred)
    graph = BipartiteGraph.load_npz(args.graph)
    trainer = RecTrainer(cfg, graph, mesh=_make_mesh(args.mesh))
    params = load_params_npz(args.params)
    res = trainer.evaluate(params, args.split)
    print(format_metrics_block(args.split.upper(), res))
    print(json.dumps({str(k): v for k, v in res.items()}, default=float))


def build_parser():
    ap = argparse.ArgumentParser(prog="bb-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("build-graph", help="JSONL -> bipartite graph npz")
    p.add_argument("--jsonl", required=True)
    p.add_argument("--out", required=True)
    _add_overrides(p)
    p.set_defaults(fn=cmd_build_graph)

    p = sub.add_parser("train-cred", help="Stage A: train credibility model")
    p.add_argument("--jsonl", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--plots", action="store_true",
                   help="write fake-vs-genuine feature distribution PNGs")
    p.add_argument("--checkpoint", action="store_true",
                   help="async Orbax full-state checkpoints under "
                        "OUT/cred_ckpt")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest OUT/cred_ckpt state")
    p.add_argument("--mesh", default=None,
                   help="'all' or device count: sharded Stage-A forward")
    p.add_argument("--ckpt-keep", type=int, default=3)
    p.add_argument("--ckpt-every", type=int, default=1)
    _add_overrides(p)
    p.set_defaults(fn=cmd_train_cred)

    p = sub.add_parser("merge-user-ids",
                       help="join a credibility .npy with a graph's id map "
                            "into the CSV contract (merge_user_id.py)")
    p.add_argument("--npy", required=True)
    p.add_argument("--graph", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_merge_user_ids)

    p = sub.add_parser("train-rec", help="Stage B: train a LightGCN variant")
    p.add_argument("--graph", required=True)
    p.add_argument("--preset", default="vanilla")
    p.add_argument("--cred", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--checkpoint", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--mesh", default=None,
                   help="'all' or device count: train sharded end-to-end")
    p.add_argument("--ckpt-keep", type=int, default=3)
    p.add_argument("--ckpt-every", type=int, default=1)
    _add_overrides(p)
    p.set_defaults(fn=cmd_train_rec)

    p = sub.add_parser("evaluate", help="evaluate saved params")
    p.add_argument("--graph", required=True)
    p.add_argument("--params", required=True)
    p.add_argument("--preset", default="vanilla")
    p.add_argument("--cred", default=None)
    p.add_argument("--split", default="test")
    p.add_argument("--mesh", default=None,
                   help="'all' or device count: distributed evaluation")
    _add_overrides(p)
    p.set_defaults(fn=cmd_evaluate)
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
