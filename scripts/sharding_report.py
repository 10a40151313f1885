"""Scaling paper trail for the scaled_10m config (VERDICT r3 item 9).

Builds the scaled_10m operator set (10M-edge zipf graph, cu_message
weights, both propagation directions) on a virtual 8-device mesh and
records the evidence a future real >=2-host run will be judged against:
per-device padded-edge balance, pad fraction, halo h_max, and the
halo-vs-allgather collective row volumes.  Also records the per-batch
full-eval exclusion-row memory (VERDICT r3 item 4 "Done" clause).

Output: runs/sharding_report.json + a markdown table on stdout (pasted
into runs/SUMMARY.md).

Run with:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/sharding_report.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from bench import build_graph
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.configs.presets import (
        get_preset)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.operators import (
        build_edge_maps)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.mesh import (
        make_mesh)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.sharded_spmm import (
        ShardedSpmmOperator)

    assert len(jax.devices()) >= 8, "run with host_platform_device_count=8"
    mesh = make_mesh(8, shape=(2, 4))
    cfg = get_preset("scaled_10m")
    graph = build_graph("large")          # 500K users / 1M items / ~10M edges
    E = graph.train_edges.shape[1]
    print(f"graph: {graph.summary()}", file=sys.stderr)

    cred = np.random.default_rng(0).uniform(
        0.2, 1.0, graph.num_users).astype(np.float32)
    ifu_map, ufi_map = build_edge_maps(graph, cfg.weight_mode, cred)

    report = {"config": "scaled_10m", "mesh": {"data": 2, "model": 4},
              "graph": {"users": graph.num_users, "items": graph.num_items,
                        "train_edges": E},
              "operators": {}}
    rows = []
    for name, em in (("item_from_user", ifu_map), ("user_from_item",
                                                   ufi_map)):
        op = ShardedSpmmOperator(em, mesh=mesh, mode="halo")
        s = op.stats
        report["operators"][name] = s
        bal = max(s["fwd"]["edge_counts"]) / max(
            1, int(np.mean(s["fwd"]["edge_counts"])))
        rows.append((name, s, bal))
        del op

    # per-batch full-eval exclusion memory (item 4 paper trail)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.eval.retrieval import (
        exclusion_rows_for_users)
    users = np.random.default_rng(1).integers(0, graph.num_users, 512)
    excl = exclusion_rows_for_users(graph, users)
    max_deg = int(graph.user_csr("train").degrees().max())
    report["full_eval_exclusion"] = {
        "batch": 512, "batch_rows_shape": list(excl.shape),
        "batch_bytes": int(excl.nbytes),
        "global_table_bytes_would_be": int(graph.num_users * max_deg * 4),
    }

    out = Path("runs/sharding_report.json")
    out.write_text(json.dumps(report, indent=2))
    print(f"wrote {out}", file=sys.stderr)

    D = cfg.emb_dim
    print("| operator | per-device edges (min..max) | e_max pad | halo "
          "h_max | halo vol (MB, D=%d) | allgather vol (MB) |" % D)
    print("|---|---|---|---|---|---|")
    for name, s, bal in rows:
        ec = s["fwd"]["edge_counts"]
        halo_mb = s["halo_rows"] * D * 4 / 1e6
        ag_mb = s["allgather_rows"] * D * 4 / 1e6
        print(f"| {name} | {min(ec):,}..{max(ec):,} (balance "
              f"{max(ec)/ (sum(ec)/len(ec)):.3f}x) | "
              f"{s['fwd']['pad_fraction']:.1%} | {s['fwd']['h_max']:,} | "
              f"{halo_mb:.1f} | {ag_mb:.1f} |")
    fe = report["full_eval_exclusion"]
    print(f"\nfull-eval exclusion rows: batch {fe['batch_rows_shape']} = "
          f"{fe['batch_bytes']/1e6:.2f} MB/batch vs "
          f"{fe['global_table_bytes_would_be']/1e9:.2f} GB global table")


if __name__ == "__main__":
    main()
