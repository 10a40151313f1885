"""Scaling-efficiency projection for scaled_10m (VERDICT r4 task 4).

Real >=2-host hardware is unavailable in this environment (one v5e chip
behind a relay), so the >=0.8-efficiency north star (BASELINE.json) cannot
be time-domain measured.  What CAN be produced: a projection that converts

  * the PLANNED per-direction collective volumes at P = 2/4/8 model shards
    (the same ShardedSpmmOperator planner the mesh path runs, executed on
    the actual 10M-edge benchmark graph — not extrapolated), and
  * measured single-chip step-term timings (propagate / BPR-step / eval,
    scripts/probe_scaling_terms.py on the real v5e), and
  * v5e per-chip bandwidth constants (assumptions stated in the output)

into predicted per-epoch time and scaling efficiency at 2/4/8 chips.  The
verdict is recorded in docs/SCALING.md; a future real multi-chip run is
judged against it.

Model (per training epoch of the scaled_10m per_epoch schedule):

  T(P) = T_prop_local/P + n_prop_apps * V_coll(P)/BW_ici
       + T_steps_local/P + T_fixed

  * T_prop_local: single-chip propagation compute+HBM time; local
    segment-sum work splits by destination span (edge-balanced, measured
    imbalance <=1.05x, runs/sharding_report.json).
  * V_coll(P): per-application collective bytes ON THE BOTTLENECK CHIP —
    halo: rows_received = P*h_max per chip; allgather: (P-1)/P *
    padded_rows; the planner's per-direction auto choice picks the min.
  * T_steps_local: the 62 BPR scan steps (sampling, gathers, dense Adam on
    row-sharded tables) — row-sharded over model, batch-sharded over data.
  * T_fixed: host-side epoch overhead (permutation, dispatch) — does not
    shrink.

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/scaling_projection.py [--terms runs/scaling_terms.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

# ---- v5e constants (assumptions; stated in the output) --------------------
HBM_GBPS = 819.0          # HBM bandwidth per chip
# ICI: v5e exposes ~45 GB/s per link per direction; a 2D-torus slice gives a
# chip 4 links but a ring all-gather / all-to-all is bottlenecked by the
# bisection along one axis — model an effective 90 GB/s/chip for P<=4 (one
# ring, both directions) and 180 GB/s at P=8 (2x4 torus, two axes usable).
ICI_GBPS = {2: 90.0, 4: 90.0, 8: 180.0}


def preset_constants():
    """D / message bytes / K from the scaled_10m preset AS SHIPPED — the
    projection can no longer silently assume a precision the preset does
    not set (VERDICT r4 item 1)."""
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.configs.presets import (
        get_preset)
    cfg = get_preset("scaled_10m")
    return (cfg.emb_dim, 2 if cfg.spmm_precision == "bf16" else 4,
            cfg.num_layers, cfg.spmm_precision)


D, BYTES, K_LAYERS, MSG_PRECISION = preset_constants()


def build_graph():
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.build import (
        synthetic_bipartite_graph_planted)
    return synthetic_bipartite_graph_planted(
        500_000, 1_000_000, 20.0, seed=0, power=1.0,
        coarse_clusters=16, fine_per_coarse=16, mix=(0.55, 0.25, 0.20))


def plan_volumes(graph, n_model):
    """Per-application collective bytes on the bottleneck chip for the two
    cu_message directions at ``n_model`` model shards (planner-derived)."""
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.graph.operators import (
        build_edge_maps)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.mesh import (
        make_mesh)
    from beyond_binary_fake_user_detection_a_credibility_aware_graph_based_recommender_system_tpu.parallel.sharded_spmm import (
        ShardedSpmmOperator)
    mesh = make_mesh(n_model * 1, shape=(1, n_model))
    cred = np.ones(graph.num_users, np.float32)
    ifu_map, ufi_map = build_edge_maps(graph, "cu_message", cred)
    out = {}
    for name, em in (("item_from_user", ifu_map), ("user_from_item", ufi_map)):
        op = ShardedSpmmOperator(em, mesh, mode="auto")
        s = op.stats
        # halo_h_max_considered is the TRUE halo plan's h_max — recorded
        # by the auto decision even when allgather wins (the built
        # allgather plan's own h_max field is a placeholder 1).
        halo_h_max = s["fwd"]["halo_h_max_considered"]
        per_chip_rows = {
            "halo": n_model * halo_h_max,                       # rows recv'd
            "allgather": (n_model - 1) * s["src_padded_rows"] // n_model,
        }
        mode = s["fwd_mode"]
        out[name] = {
            "mode": mode,
            "h_max": halo_h_max,
            "src_padded_rows": s["src_padded_rows"],
            "rows_per_chip": per_chip_rows[mode],
            "rows_per_chip_halo": per_chip_rows["halo"],
            "rows_per_chip_allgather": per_chip_rows["allgather"],
            "bytes_per_chip": per_chip_rows[mode] * D * BYTES,
            "e_max": s["fwd"]["e_max"],
            "pad_fraction": s["fwd"]["pad_fraction"],
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--terms", default="runs/scaling_terms.json",
                    help="measured single-chip terms "
                         "(scripts/probe_scaling_terms.py)")
    ap.add_argument("--out", default="runs/scaling_projection.json")
    args = ap.parse_args()

    terms = json.loads(Path(args.terms).read_text())
    # measured single-chip terms (seconds)
    t_prop = terms["propagate_s"]           # one K-layer propagate, 10M
    t_steps = terms["scan_steps_s"]         # 62 cached-BPR steps
    t_fixed = terms.get("fixed_s", 0.05)
    t_eval = terms.get("eval_epoch_s", None)  # optional: full fast eval

    graph = build_graph()
    E = graph.train_edges.shape[1]
    print(f"graph: {graph.summary()}", file=sys.stderr)

    # propagation applications per epoch: K layers x 2 directions, forward
    # only (the per_epoch cache is under stop_gradient)
    n_apps_per_dir = K_LAYERS

    # refuse to mix precisions: the measured terms must come from the same
    # message precision the preset ships (and whose bytes V uses)
    terms_cfg = terms.get("config", "")
    assert f"{MSG_PRECISION} messages" in terms_cfg, (
        f"terms were measured under a different precision than the shipped "
        f"preset ({MSG_PRECISION}): {terms_cfg!r} — re-run "
        f"scripts/probe_scaling_terms.py")

    report = {"assumptions": {
        "HBM_GBps": HBM_GBPS, "ICI_GBps_per_chip": ICI_GBPS,
        "emb_dim": D, "message_bytes": BYTES, "layers": K_LAYERS,
        "message_precision": MSG_PRECISION,
        "graph": {"users": graph.num_users, "items": graph.num_items,
                  "train_edges": int(E)},
        "terms_measured": terms,
        "model": "T(P) = t_prop/P + K*sum_dir V_dir(P)/BW_ici + t_steps/P "
                 "+ t_fixed; V = bottleneck-chip recv bytes per SpMM app",
    }, "projections": {}}

    t1 = t_prop + t_steps + t_fixed
    for P in (2, 4, 8):
        vols = plan_volumes(graph, P)
        coll_bytes = sum(v["bytes_per_chip"] for v in vols.values()) \
            * n_apps_per_dir
        t_coll = coll_bytes / (ICI_GBPS[P] * 1e9)
        tP = t_prop / P + t_steps / P + t_coll + t_fixed
        eff = t1 / (P * tP)
        row = {
            "volumes": vols,
            "collective_bytes_per_epoch_per_chip": int(coll_bytes),
            "t_collective_s": t_coll,
            "t_epoch_projected_s": tP,
            "t_epoch_1chip_s": t1,
            "scaling_efficiency": eff,
        }
        if t_eval is not None:
            # eval: score matmul column-sharded over items -> compute/HBM
            # splits by P; merge top-k is O(B*K*P) — negligible
            row["t_eval_projected_s"] = t_eval / P
        report["projections"][str(P)] = row
        print(f"P={P}: t_epoch {tP:.3f}s (coll {t_coll*1e3:.1f} ms) "
              f"eff={eff:.3f}", file=sys.stderr)

    Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps({k: {"eff": round(v["scaling_efficiency"], 3),
                          "t_epoch_s": round(v["t_epoch_projected_s"], 3)}
                      for k, v in report["projections"].items()}))


if __name__ == "__main__":
    main()
